package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming face of B1 dedup_exact,
  * the front gate of a continuously-ingesting training-data pipeline
  * (the same stream-shaped source the reference conduit consumes).
  *
  * Two contracts, different state growth:
  *
  *  - [[exactGlobal]]: `dropDuplicates(keys)` — a key is emitted once for
  *    the lifetime of the query. State grows with distinct keys forever;
  *    only safe when the key space is bounded (it is NOT at 100 TB/day —
  *    documented, kept for the bounded-key case).
  *  - [[withinWatermark]]: `dropDuplicatesWithinWatermark(keys)` — a key
  *    is emitted once per watermark horizon; state for keys older than
  *    the watermark is dropped by the engine. State is bounded by
  *    (arrival rate × horizon) regardless of stream lifetime — the
  *    100 TB-scale path. Duplicates separated by more than the horizon
  *    re-emit; that is the documented trade (downstream batch dedup_exact
  *    catches stragglers).
  */
object StreamingDedup {

  /** Lifetime-global dedup: unbounded state, bounded-key streams only. */
  def exactGlobal(stream: DataFrame, keys: Seq[String]): DataFrame =
    stream.dropDuplicates(keys)

  /** Watermark-bounded dedup on `keys`: exactly-one emit per key within
    * the `watermark` horizon on event-time column `tsCol`; engine prunes
    * state past the watermark. */
  def withinWatermark(stream: DataFrame, keys: Seq[String],
                      tsCol: String = "ts",
                      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Batch-equivalence reference for the specs: the rows the watermarked
    * stream must emit for an in-horizon input — first row per key in
    * (ts, tiebreak) order is representative; we compare key sets, since
    * which duplicate wins is arrival-order-defined in a stream. */
  def distinctKeys(batch: DataFrame, keys: Seq[String]): Dataset[org.apache.spark.sql.Row] =
    batch.select(keys.map(col): _*).distinct()
}
