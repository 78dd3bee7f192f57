package graft

import graft.operators.{ConnectionPool, SinkOps}

/** Fault-injection spec for the behavioral A15 pool: LRU size bound,
  * expire-after-access TTL (injected clock), evict-on-failure +
  * reconnect counts, and the pooled foreachPartition sink path. */
class ConnectionPoolSpec extends SparkSpec {

  /** Fake connection with observable lifecycle. */
  private final class Conn(val ep: String) {
    @volatile var closed = false
  }

  private def newPool(maxSize: Int, ttl: Long, now: () => Long,
                      opened: java.util.concurrent.ConcurrentLinkedQueue[Conn]) =
    new ConnectionPool[String, Conn](
      factory = ep => { val c = new Conn(ep); opened.add(c); c },
      onClose = c => c.closed = true,
      maxSize = maxSize, ttlMillis = ttl, clock = now)

  test("LRU size bound: least-recently-USED closes first, hits reorder") {
    val opened = new java.util.concurrent.ConcurrentLinkedQueue[Conn]()
    val pool = newPool(3, Long.MaxValue / 2, () => 0L, opened)
    val a = pool.get("a"); val b = pool.get("b"); pool.get("c")
    // touch a: b becomes least-recently-used
    assert(pool.get("a") eq a)
    pool.get("d") // evicts b, NOT a
    assert(pool.size == 3)
    assert(b.closed && !a.closed)
    assert(pool.get("a") eq a, "a must still be cached")
    assert(pool.stats("evicted_size") == 1L)
    // b reconnects on next use (fresh object)
    assert(!(pool.get("b") eq b))
  }

  test("TTL: idle entries expire on access sweep and on cleanUp (nudge)") {
    val opened = new java.util.concurrent.ConcurrentLinkedQueue[Conn]()
    var now = 0L
    val pool = newPool(64, ttl = 100L, () => now, opened)
    val a = pool.get("a")
    now = 50L
    val b = pool.get("b")
    assert(pool.get("a") eq a, "49ms-fresh entry must survive") // also re-touches a at t=50
    now = 149L
    // a touched at 50 (idle 99), b loaded at 50 (idle 99): both fresh
    pool.cleanUp()
    assert(pool.size == 2)
    now = 151L
    pool.cleanUp()
    assert(pool.size == 0 && a.closed && b.closed)
    assert(pool.stats("evicted_ttl") == 2L)
    // expired entries are swept before get hands anything out
    val a2 = pool.get("a")
    assert(!(a2 eq a))
  }

  test("evict-on-failure: next get() reconnects; counters track causes") {
    val opened = new java.util.concurrent.ConcurrentLinkedQueue[Conn]()
    val pool = newPool(64, Long.MaxValue / 2, () => 0L, opened)
    val c1 = pool.get("ep")
    pool.evict("ep")
    assert(c1.closed)
    val c2 = pool.get("ep")
    assert(!(c2 eq c1) && !c2.closed)
    assert(pool.stats("evicted_explicit") == 1L)
    assert(pool.stats("loads") == 2L)
  }

  test("connPoolState refuses a high-cardinality endpoint column (the " +
    "global LRU ranking is a one-task sort by design)") {
    import spark.implicits._
    val events = (0 until 500).map(i =>
      (i.toLong, new java.sql.Timestamp(i * 1000L), s"ep$i"))
      .toDF("event_id", "ts", "endpoint")
    // the gate is IN-PLAN (construction stays lazy — an eager probe
    // would run the aggregation twice): the job aborts at execution
    val e = intercept[Exception] {
      SinkOps.connPoolState(events, "endpoint", maxEndpoints = 100).count()
    }
    assert(e.getMessage.contains("distinct endpoints"))
    // within the bound the state computes as before
    val ok = SinkOps.connPoolState(events, "endpoint", maxEndpoints = 500)
    assert(ok.count() == 500)
  }

  test("pooledPartitionWrite: connections shared across rows per executor, " +
    "one flaky endpoint evicts + reconnects, permanently-down endpoint " +
    "fails the job after the write envelope") {
    import spark.implicits._
    val rows = (0 until 200).map(i => (i.toLong, s"ep${i % 5}"))
      .toDF("event_id", "endpoint")

    // JVM-global observability for the executor-side pool (local[32] =
    // same JVM): opened-per-endpoint and per-connection write counts
    ConnectionPoolSpec.reset()
    SinkOps.pooledPartitionWrite[ConnectionPoolSpec.CountingConn](
      rows, "endpoint", poolId = "spec_pool_ok",
      connect = ep => ConnectionPoolSpec.open(ep, failFirstWritesOf = Map.empty),
      writeRow = (c, _) => c.write(),
      closeConn = _.close())
    // 5 endpoints, one shared pool in this JVM → exactly 5 connections
    // for 200 rows (never one per task/row)
    assert(ConnectionPoolSpec.openedCount() == 5,
      s"expected 5 connections, opened ${ConnectionPoolSpec.openedCount()}")
    assert(ConnectionPoolSpec.totalWrites() == 200)

    // a flaky endpoint: first write on each of the first 2 connections
    // throws → evict + reconnect; 3rd connection succeeds
    ConnectionPoolSpec.reset()
    SinkOps.pooledPartitionWrite[ConnectionPoolSpec.CountingConn](
      Seq((1L, "flaky")).toDF("event_id", "endpoint").coalesce(1),
      "endpoint", poolId = "spec_pool_flaky",
      connect = ep => ConnectionPoolSpec.open(ep, failFirstWritesOf = Map("flaky" -> 2)),
      writeRow = (c, _) => c.write(),
      closeConn = _.close())
    assert(ConnectionPoolSpec.openedCount() == 3,
      "2 failed connections evicted + 1 fresh success expected")
    assert(ConnectionPoolSpec.closedCount() == 2,
      "both failed connections must be closed by eviction")

    // permanently down: WriteAttempts exhausted → job fails, and every
    // attempt used a FRESH connection (evict between attempts)
    ConnectionPoolSpec.reset()
    val e = intercept[Exception] {
      SinkOps.pooledPartitionWrite[ConnectionPoolSpec.CountingConn](
        Seq((1L, "down")).toDF("event_id", "endpoint").coalesce(1),
        "endpoint", poolId = "spec_pool_down",
        connect = ep => ConnectionPoolSpec.open(ep, failFirstWritesOf = Map("down" -> Int.MaxValue)),
        writeRow = (c, _) => c.write(),
        closeConn = _.close())
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb ++= Option(c.getMessage).getOrElse(""); c = c.getCause }
      sb.toString
    }
    assert(rootMsg(e).contains("write to down failed"))
    // Spark may retry the task (default local retries = 1): per ATTEMPT,
    // WriteAttempts fresh connections
    assert(ConnectionPoolSpec.openedCount() % SinkOps.WriteAttempts == 0 &&
      ConnectionPoolSpec.openedCount() >= SinkOps.WriteAttempts)
    Seq("spec_pool_ok", "spec_pool_flaky", "spec_pool_down")
      .foreach(ConnectionPool.remove)
  }
}

/** JVM-global fixture state: executor tasks and the spec share this
  * object in local mode, giving the spec eyes on executor-side pools. */
object ConnectionPoolSpec {
  final class CountingConn(val ep: String, failFirst: Int) {
    private val writes = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var isClosed = false
    def write(): Unit = {
      if (writes.incrementAndGet() <= failFirst)
        throw new java.io.IOException(s"injected write failure on $ep")
    }
    def close(): Unit = { isClosed = true; closed.incrementAndGet(); () }
    def writeCount: Int = writes.get()
  }

  private val conns = new java.util.concurrent.ConcurrentLinkedQueue[CountingConn]()
  private val closed = new java.util.concurrent.atomic.AtomicInteger(0)
  private val failuresUsed = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()

  def open(ep: String, failFirstWritesOf: Map[String, Int]): CountingConn = {
    // per-ENDPOINT failure budget across connections: connection n of a
    // flaky endpoint fails its first write while budget remains
    val budget = failFirstWritesOf.getOrElse(ep, 0)
    val used = failuresUsed
      .computeIfAbsent(ep, _ => new java.util.concurrent.atomic.AtomicInteger(0))
    val failThis = if (used.getAndIncrement() < budget) 1 else 0
    val c = new CountingConn(ep, failThis)
    conns.add(c)
    c
  }

  def reset(): Unit = { conns.clear(); closed.set(0); failuresUsed.clear() }
  def openedCount(): Int = conns.size()
  def closedCount(): Int = closed.get()
  def totalWrites(): Int = {
    var s = 0
    conns.forEach(c => s += c.writeCount)
    s
  }
}
