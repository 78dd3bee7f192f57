package graft.operators

/** A15 conn_pool — BEHAVIORAL analogue of the reference's Hive endpoint
  * connection cache (hive/HiveConnectionPool.java:45-109): LRU bounded
  * size + expire-after-access TTL + close-on-removal + explicit eviction
  * (the reference invalidates an endpoint's stream when a write fails so
  * the retry reconnects — hive/HiveSink.java:78-80, and exposes a
  * `nudge()` that sweeps expired entries — HiveConnectionPool.java:118).
  *
  * Spark manages writer lifecycles for file/catalog sinks, so a pool
  * only matters for the sink class Spark does NOT manage: JDBC-style
  * connection-oriented `foreachPartition` sinks. There, connections must
  * be shared ACROSS partition tasks of the same executor (opening one
  * per task is the classic anti-pattern) — hence one pool per executor
  * JVM ([[ConnectionPool.registered]]), exactly the reference's
  * static-pool shape. The declarative policy view of the same semantics
  * (what the driver oracle checks) remains [[SinkOps.connPoolState]].
  *
  * Single-JVM mutable state by design: this object never ships through a
  * shuffle — tasks reach it via its registry id. All operations are
  * synchronized; the hot path is one hash lookup.
  */
final class ConnectionPool[K, C](
    factory: K => C,
    onClose: C => Unit,
    maxSize: Int = ConnectionPool.DefaultPoolSize,
    ttlMillis: Long = ConnectionPool.DefaultTtlMillis,
    clock: () => Long = () => System.currentTimeMillis()) {
  require(maxSize > 0, s"maxSize must be positive, got $maxSize")
  require(ttlMillis > 0, s"ttlMillis must be positive, got $ttlMillis")

  private final class Entry(val conn: C, var lastAccess: Long)

  // access-order LinkedHashMap: iteration order = least-recently-USED
  // first (get() reorders), the same LRU the reference gets from
  // CacheBuilder.maximumSize + expireAfterAccess
  private val entries = new java.util.LinkedHashMap[K, Entry](16, 0.75f, true)

  private var loadsN, hitsN, evictedSizeN, evictedTtlN, evictedExplicitN = 0L

  /** Cached connection, or a freshly loaded one (the reference's
    * LoadingCache.get). Expired entries are swept first, so a stale
    * connection is never handed out. */
  def get(key: K): C = synchronized {
    expire()
    val e = entries.get(key)
    if (e != null) { hitsN += 1; e.lastAccess = clock(); e.conn }
    else {
      val c = factory(key)
      loadsN += 1
      entries.put(key, new Entry(c, clock()))
      shrink()
      c
    }
  }

  /** The reference's getOptionally: no load on miss. */
  def getIfPresent(key: K): Option[C] = synchronized {
    expire()
    Option(entries.get(key)).map { e =>
      hitsN += 1; e.lastAccess = clock(); e.conn
    }
  }

  /** Replace (closing any previous connection for the key). */
  def put(key: K, c: C): Unit = synchronized {
    val old = entries.put(key, new Entry(c, clock()))
    if (old != null) close(old.conn)
    shrink()
  }

  /** Evict-on-failure: drop and close the key's connection so the next
    * get() reconnects (hive/HiveSink.java:78-80 on write failure). */
  def evict(key: K): Unit = synchronized {
    val e = entries.remove(key)
    if (e != null) { evictedExplicitN += 1; close(e.conn) }
  }

  /** The reference's nudge(): sweep TTL-expired entries now. */
  def cleanUp(): Unit = synchronized { expire() }

  def size: Int = synchronized { entries.size }

  /** Behavior counters (loads, hits, evictions by cause) — what the
    * fault-injection spec asserts and an ops dashboard would chart. */
  def stats: Map[String, Long] = synchronized {
    Map("loads" -> loadsN, "hits" -> hitsN, "evicted_size" -> evictedSizeN,
      "evicted_ttl" -> evictedTtlN, "evicted_explicit" -> evictedExplicitN)
  }

  /** Close everything (pool teardown). */
  def closeAll(): Unit = synchronized {
    entries.values.forEach(e => close(e.conn))
    entries.clear()
  }

  // closing is best-effort, like the reference's removal listener: a
  // throwing close() must not poison the cache operation that evicted it
  private def close(c: C): Unit =
    try onClose(c) catch { case _: Exception => () }

  private def expire(): Unit = {
    val now = clock()
    val it = entries.entrySet().iterator()
    var stale = true
    // access-order iteration is least-recently-used first — stop at the
    // first fresh entry
    while (stale && it.hasNext) {
      val e = it.next()
      if (now - e.getValue.lastAccess >= ttlMillis) {
        it.remove(); evictedTtlN += 1; close(e.getValue.conn)
      } else stale = false
    }
  }

  private def shrink(): Unit =
    while (entries.size > maxSize) {
      val it = entries.entrySet().iterator()
      val e = it.next()
      it.remove()
      evictedSizeN += 1
      close(e.getValue.conn)
    }
}

object ConnectionPool {
  /** The reference's defaults: HIVE_CONNECTION_POOL_SIZE = 64 and
    * HIVE_CONNECTION_TTL = 30 minutes (hive/HiveConnectionPool.java:45-46). */
  val DefaultPoolSize: Int = 64
  val DefaultTtlMillis: Long = 30L * 60L * 1000L

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ConnectionPool[_, _]]()

  /** Executor-JVM singleton pool: closures ship the (serializable) id;
    * the pool itself is created lazily at most once per executor and
    * shared by every partition task that lands there. */
  def registered[K, C](id: String)(mk: => ConnectionPool[K, C]): ConnectionPool[K, C] =
    registry.computeIfAbsent(id, _ => mk).asInstanceOf[ConnectionPool[K, C]]

  /** Drop a registered pool, closing its connections. */
  def remove(id: String): Unit = {
    val p = registry.remove(id)
    if (p != null) p.closeAll()
  }
}
