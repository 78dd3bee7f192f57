package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** A12-A16, A18 — the reference's sink-side machinery re-expressed as
  * declarative, oracle-checkable operators plus a real partitioned write.
  *
  * The reference implements these imperatively (writer thread pools,
  * connection caches, retry loops); in Spark most of that machinery IS the
  * engine (task scheduling, committers, task retry). What remains
  * semantically observable — batch boundaries, writer assignment,
  * partition layout, cache eviction policy, suppression windows — is
  * modeled as data transformations here so the driver oracle can check it.
  */
object SinkOps {

  /** A12 batch_barrier — micro-batch assembly: rows chunked into blocks of
    * `blockSize` by stream order, one summary row per block (the
    * onBlockStart / processRow / onBlockCompletion cycle,
    * hive/HiveExportClient.java:171-196). */
  def batchBarrier(events: DataFrame, blockSize: Int = 1000): DataFrame =
    events
      .withColumn("batch_id", expr(s"event_id div $blockSize"))
      .groupBy(col("batch_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("event_id")).as("first_row"),
        max(col("event_id")).as("last_row"))
      .orderBy(col("batch_id"))

  /** A13 parallel_sink_write — writer-thread assignment: endpoint hashed
    * to one of `writers` lanes so each partition is written by exactly one
    * lane (per-partition serial order, cross-partition parallel;
    * hive/HiveSink.java:45-57,67-72). The hash is md5-based so the DuckDB
    * oracle computes the identical assignment. */
  def writerAssignment(routed: DataFrame, partitionCol: String,
                       writers: Int = 4): DataFrame =
    routed
      .withColumn("writer_id", pmod(ascii(substring(md5(col(partitionCol)), 1, 1)), lit(writers)))
      .groupBy(col("writer_id"))
      .agg(
        countDistinct(col(partitionCol)).as("n_endpoints"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("writer_id"))

  /** A14 sink_txn_batch — the real partitioned, committed write: route
    * events by sentinel-normalized event_type, write
    * partitionBy(event_type) parquet through Spark's commit protocol, read
    * the committed result back and summarize per partition. Exercises the
    * full physical sink path (dynamic partition dirs, sentinel directory
    * names, atomic commit) with an oracle-checkable result. */
  def txnBatchRoundTrip(spark: SparkSession, events: DataFrame): DataFrame = {
    val out = Files.createTempDirectory("graft_sink_").toString
    val routed = ExportPipeline.route(events, Seq("event_type"))
    ExportPipeline.writeRouted(routed, out)
    spark.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"), min(col("payload_json")).as("first_payload"))
      .orderBy(col("event_type"))
  }

  /** A15 conn_pool — LRU(max)+TTL cache semantics over endpoints: an
    * endpoint's last access is its newest event; it stays cached iff it is
    * within the `maxSize` most-recently-used AND idle less than `ttlMin`
    * minutes at end-of-stream (hive/HiveConnectionPool.java:45-57). */
  def connPoolState(events: DataFrame, partitionCol: String,
                    maxSize: Int = 64, ttlMin: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lastSeen = events
      .select(ExportOps.nullSentinel(col(partitionCol)).as("endpoint"), col("ts"))
      .groupBy(col("endpoint"))
      .agg(max(col("ts")).as("last_seen"), count(lit(1)).as("n_uses"))
    // single-partition Window is fine: endpoint count is bounded by the
    // pool-size semantics (the reference caps it at 64 connections)
    val w = Window.orderBy(col("last_seen").desc, col("endpoint"))
    lastSeen
      .withColumn("lru_rank", row_number().over(w).cast("long"))
      .withColumn("idle_sec",
        unix_timestamp(max(col("last_seen")).over(Window.partitionBy()))
          - unix_timestamp(col("last_seen")))
      .withColumn("cached",
        col("lru_rank") <= maxSize && col("idle_sec") < ttlMin * 60)
      .select(col("endpoint"), col("last_seen"), col("n_uses"),
        col("lru_rank"), col("idle_sec"), col("cached"))
      .orderBy(col("endpoint"))
  }

  /** A16 retry_reconnect — the bounded-retry envelope as data: the
    * schedule of (operation, attempt, backoff, on-final-failure) the
    * reference hard-codes (hive/HivePartitionStream.java:81-122,147-173;
    * block replay hive/HiveExportClient.java:190-196). In Spark the
    * mechanism itself is spark.task.maxFailures + checkpoint restart. */
  def retryPolicy(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("txn_batch_fetch", 1, 30, "retry"),
      ("txn_batch_fetch", 2, 30, "retry"),
      ("txn_batch_fetch", 3, 30, "retry"),
      ("txn_batch_fetch", 4, 0, "reconnect"),
      ("write", 1, 0, "reconnect_and_retry"),
      ("write", 2, 0, "reconnect_and_retry"),
      ("write", 3, 0, "restart_block"))
      .toDF("operation", "attempt", "backoff_ms", "on_failure")
      .orderBy(col("operation"), col("attempt"))
  }

  /** A18 rate_limited_log — 10 s suppression window per message
    * (hive/HiveExportLogger.java:36-49), modeled on event_type as the
    * message key: emit the first event per (key, 10 s bucket), count the
    * suppressed rest. */
  def rateLimitedLog(events: DataFrame, windowSec: Int = 10): DataFrame =
    events
      .groupBy(window(col("ts"), s"$windowSec seconds"), col("event_type"))
      .agg(min(col("ts")).as("emitted_ts"), (count(lit(1)) - 1).as("n_suppressed"))
      .select(col("event_type"), col("window.start").as("win_start"),
        col("emitted_ts"), col("n_suppressed"))
      .orderBy(col("event_type"), col("win_start"))
}
