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
}
