package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming face of Sessionize.tumbling — watermarked tumbling-window
  * aggregation in APPEND mode: a window row is emitted exactly once,
  * after the watermark passes the window's end (closed-window
  * semantics — what a downstream exactly-once sink wants, since a row,
  * once written, never changes). State is bounded: the engine evicts
  * window state older than the watermark, so long-running queries hold
  * (windows-in-horizon × group keys), not history.
  *
  * Same grouping expressions as the batch form (window() is a grouping
  * column ⇒ partial aggregation; the shuffle carries (window, key)
  * partials only), so the batch oracle `event_window_tumbling` IS the
  * correctness reference for what each closed window must contain.
  */
object StreamingWindows {

  def tumbling(events: DataFrame, width: String = "1 hour",
               watermark: String = "10 minutes"): DataFrame =
    hopping(events, width, width, watermark)

  /** Hopping (sliding) windows: `width`-wide windows advancing every
    * `slide` — each event lands in width/slide overlapping windows.
    * Catalyst expands window() to the covering window set BEFORE
    * aggregation (and collapses to the tumbling fast path when slide ==
    * width), so partial aggregation, append-mode closed-window emission
    * and watermark state eviction all work exactly as in [[tumbling]];
    * state (and shuffle) grow by the overlap factor width/slide, still
    * bounded by the watermark horizon. */
  def hopping(events: DataFrame, width: String = "1 hour",
              slide: String = "15 minutes",
              watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("sum_value"))
}
