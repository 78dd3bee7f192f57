package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the streaming face of the
  * batch range join (Relational.rangeJoin): match right-stream rows to
  * left-stream rows on an equi-key within a bounded event-time window.
  *
  * Why the bounds are mandatory: a stream-stream join buffers BOTH
  * sides in the state store until a match can be ruled out. The
  * watermarks plus the two-sided time constraint give the engine an
  * eviction proof — a left row older than (right watermark − upper) can
  * never match again and is dropped — so state is bounded by the time
  * window × arrival rate, never by stream history. Without the interval
  * condition the state store grows forever; this operator makes the
  * bound part of the API instead of a caller obligation.
  *
  * Inner join only: stream-stream outer joins emit null-padded rows at
  * watermark expiry (late, by design); the pipeline-gate use cases this
  * library targets (impression↔click, request↔response, interval
  * containment) want the matched pairs. */
object StreamingJoin {

  /** Join rows of `left` and `right` sharing `key` where
    * `right.ts ∈ [left.ts + lowerSec, left.ts + upperSec]`. Column
    * names on both inputs must include `key` and an event-time `ts`;
    * output columns are key, l_ts, r_ts plus the non-key payloads of
    * both sides (left's first). */
  def interval(left: DataFrame, right: DataFrame, key: String,
               lowerSec: Long = 0L, upperSec: Long = 3600L,
               watermark: String = "10 minutes"): DataFrame = {
    require(lowerSec <= upperSec,
      s"empty interval: lowerSec=$lowerSec > upperSec=$upperSec")
    val l = left.withWatermark("ts", watermark)
      .select(col(key) +: left.columns.filter(_ != key).map(c =>
        col(c).as(s"l_$c")): _*)
    val r = right.withWatermark("ts", watermark)
      .select(col(key).as("__rkey") +: right.columns.filter(_ != key).map(c =>
        col(c).as(s"r_$c")): _*)
    l.join(r,
        col(key) === col("__rkey") &&
          col("r_ts") >= col("l_ts") + expr(s"INTERVAL $lowerSec SECOND") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $upperSec SECOND"))
      .drop("__rkey")
  }

  /** END-TO-END stream-stream-join parity replay (round 12) — the
    * sixth streaming module under the driver's full oracle, and the
    * one with TWO-SIDED state: click and purchase legs of the events
    * corpus each laid out as `nFiles` time-ranged parquet files with
    * PINNED mtime order (the file source processes oldest-mtime-first;
    * the range write lands all parts in the same millisecond, and
    * out-of-order arrival would put early rows late behind the
    * advanced watermark — the sessionize replay's discovery, applied
    * to both sides), replayed with `maxFilesPerTrigger=1` through
    * [[interval]]. Cross-batch proof: a click in batch 2 matches a
    * purchase in batch 6 only if the join STATE carried it — and inner
    * stream-stream joins emit every on-time match with no end-of-stream
    * flush needed (a pair emits when its later side arrives; ordered
    * replay means no row is ever late), so append commits union to
    * exactly the batch inequality join.
    *
    * Scale shape: the replay is the production [[interval]] plan —
    * state bounded by window × arrival rate; the splits are two
    * bounded repartitionByRange writes. */
  def intervalParityReplay(events: DataFrame, srcDir: String,
                           outDir: String, checkpointDir: String,
                           nFiles: Int = 5, upperSec: Long = 3600L,
                           watermark: String = "10 minutes"): DataFrame = {
    require(nFiles >= 2, s"need >= 2 files for a multi-batch replay: $nFiles")
    val spark = events.sparkSession
    import org.apache.spark.sql.streaming.Trigger
    def layOut(tag: String, side: DataFrame): String = {
      val dir = s"$srcDir/$tag"
      side.repartitionByRange(nFiles, col("ts"))
        .write.mode("overwrite").parquet(dir)
      val now = System.currentTimeMillis()
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .sortBy(_.getName).zipWithIndex
        .foreach { case (f, i) => f.setLastModified(now + i * 2000L) }
      dir
    }
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val lDir = layOut("l", clicks)
    val rDir = layOut("r", purchases)
    def streamOf(dir: String): DataFrame = {
      val schema = spark.read.parquet(dir).schema
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
    }
    val joined = interval(streamOf(lDir), streamOf(rDir), "user_id",
        lowerSec = 0L, upperSec = upperSec, watermark = watermark)
      .select(col("user_id"), col("l_ts"), col("l_event_id"),
        col("r_ts"), col("r_event_id"))
    ReplayConf.withReplayPartitions(spark) {
      val q = joined.writeStream
        .option("checkpointLocation", checkpointDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$outDir/batch_id=$id"); ()
        }.start()
      q.awaitTermination()
    }
    val dir = new java.io.File(outDir)
    if (!dir.exists())
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        joined.schema)
    else
      spark.read.parquet(outDir)
        .select(joined.columns.map(col): _*)
        .orderBy(col("user_id"), col("l_event_id"), col("r_event_id"))
  }
}
