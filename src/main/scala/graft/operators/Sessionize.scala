package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** B5 event_sessionize — event-time windowing over the `events` stream
  * table: tumbling windows and per-user session windows.
  *
  * Batch forms here (the correctness surface); the streaming forms add
  * `withWatermark` on the same expressions (see graft.streaming). Both are
  * single-shuffle group-bys: Spark's `window`/`session_window` are
  * grouping expressions, so partial aggregation applies and the shuffle
  * carries only (window, key) partials — the 100 TB-safe shape.
  */
object Sessionize {

  /** Tumbling event-time windows per event_type with decimal-exact value
    * sums (portable vs the DuckDB time_bucket oracle). */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  /** Session windows per user: a session closes after `gap` of inactivity.
    * Spark's session_window merges an event into the open session while
    * ts < prev_ts + gap (half-open), i.e. a new session starts when the
    * gap is ≥ the threshold — the oracle's gaps-and-islands SQL uses >=
    * to match. session end = last event + gap. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
      .select(
        col("user_id"),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("sess_start"))
}
