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

  /** SLIDING event-time windows (round 11) — the overlapping complement
    * to [[tumbling]]: every event lands in size/slide consecutive
    * windows (15 min / 5 min → exactly 3), so each window's aggregate
    * reads a smoothed trailing view — the moving-rate face of windowed
    * aggregation that dashboards and alerting actually chart. Spark's
    * `window(ts, size, slide)` is still a GROUPING expression: the
    * bounded per-row window fan-out happens map-side and partial
    * aggregation runs before the one (window, type) shuffle — same
    * 100 TB shape as tumbling, with a constant ×(size/slide) input
    * factor. Decimal-exact sums; window starts are epoch-aligned in
    * both engines, so the oracle replays with an integer-µs window
    * enumeration. */
  def sliding(events: DataFrame, size: String = "15 minutes",
              slide: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), size, slide), col("event_type"))
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

  /** PEAK CONCURRENCY (round 14) — per day, the maximum number of
    * SIMULTANEOUSLY open sessions: the capacity number every serving
    * fleet is sized by (DAU counts users, this counts the load they
    * put on the system at the worst instant). Sessions are
    * [[sessions]]' half-open [start, end) intervals; the sweep is the
    * classic ±1 line scan made DAY-DECOMPOSABLE so no partition-less
    * window exists: each session is CLIPPED to the days it spans
    * (+1 at max(start, day), −1 at end only when end falls inside the
    * day — a midnight-crossing session simply re-enters the next day
    * at its boundary, carrying its concurrency with zero cross-day
    * state). The running sum orders by (ts, delta) so an end at the
    * exact instant of a start releases first (half-open semantics);
    * rows tied on BOTH keys carry equal deltas, so the max is
    * order-independent — deterministic without a total order.
    *
    * Scale shape: sessions are user-bounded; the day explode is
    * span-bounded (a session touches few days); the sweep window is
    * PARTITIONED by day. Output: (day, n_sessions, peak_concurrency),
    * ordered by day — n_sessions counts sessions touching the day. */
  def concurrency(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = sessions(events, gap)
    val days = s.select(col("sess_start"), col("sess_end"),
      explode(sequence(
        date_trunc("day", col("sess_start")),
        date_trunc("day", col("sess_end") - expr("interval 1 microsecond")),
        expr("interval 1 day"))).as("day"))
    val deltas = days.select(col("day"),
        greatest(col("sess_start"), col("day")).as("ts"), lit(1L).as("delta"))
      .unionByName(days
        .filter(col("sess_end") < col("day") + expr("interval 1 day"))
        .select(col("day"), col("sess_end").as("ts"), lit(-1L).as("delta")))
    val w = Window.partitionBy(col("day")).orderBy(col("ts"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("run", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_sessions"),
        max(col("run")).as("peak_concurrency"))
      .orderBy(col("day"))
  }

  /** Weekly cohort retention — the classic retention triangle: users are
    * cohorted by the (Monday-truncated) week of their FIRST event, and
    * each (cohort, week_offset) row counts the distinct users active in
    * that week. Shape: one partial-aggregated groupBy(user) for the
    * cohort map, one (user, week) distinct — the same exchange family —
    * and a tiny (cohort, offset) aggregate; the fact table is never
    * joined row-to-row against itself, and the per-user frames are
    * |users|-sized, so the only full-scan cost is the two
    * partial-aggregated passes. Offsets are exact: UTC week starts are
    * whole multiples of 604800 s apart, both engines compute the same
    * integer. */
  def retention(events: DataFrame): DataFrame = {
    val wk = date_trunc("week", col("ts"))
    val firsts = events.groupBy(col("user_id")).agg(min(wk).as("cohort"))
    val active = events.select(col("user_id"), wk.as("wk")).distinct()
    active.join(firsts, Seq("user_id"))
      .select(col("cohort"),
        ((unix_timestamp(col("wk")) - unix_timestamp(col("cohort"))) / 604800L)
          .cast("long").as("week_offset"))
      // (user, wk) is distinct, so per (cohort, offset) each active user
      // contributes exactly one row — count(*) IS the distinct user count
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  /** Ordered funnel: how far each user progresses through `steps`, where
    * step n must occur STRICTLY AFTER the user's earliest completion of
    * step n-1 (the classic signup → view → purchase conversion query).
    * Output: one row per user with t1..tK (earliest valid time per step,
    * null once a step is missed) and funnel_stage = deepest step reached.
    *
    * Shape: one filtered aggregation per step — each stage aggregates
    * only that step's events (a filter-pruned slice of the scan) joined
    * to the previous stage's (user, t) frame, which is |users| rows and
    * broadcastable/AQE-handled. K small and fixed (funnels are 3-6
    * steps), so this is K narrow passes, never a per-user event sort —
    * the window-function formulation would shuffle and sort EVERY event
    * row; this shuffles per-step slices and |users|-sized frames. */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("signup", "view", "purchase")): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // stage frames: s(n) = (user_id, tn) — earliest step-n event after tn-1
    val stages = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, i)) =>
        val slice = events.filter(col("event_type") === step)
        val tn = s"t${i + 1}"
        Some(prev match {
          case None =>
            slice.groupBy(col("user_id")).agg(min(col("ts")).as(tn))
          case Some(p) =>
            slice.join(p.select(col("user_id"), col(s"t$i")), Seq("user_id"))
              .filter(col("ts") > col(s"t$i"))
              .groupBy(col("user_id")).agg(min(col("ts")).as(tn))
        })
    }.flatten
    val users = events.select(col("user_id")).distinct()
    val joined = stages.foldLeft(users) { (acc, s) =>
      acc.join(s, Seq("user_id"), "left")
    }
    // ascending fold so the DEEPEST reached step is the outermost when()
    val stage = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
    }
    joined
      .withColumn("funnel_stage", stage.cast("long"))
      .orderBy(col("user_id"))
  }

  /** WINDOWED funnel (round 13) — [[funnel]] with the conversion
    * window every product-analytics funnel actually carries: step n
    * must occur strictly after step n−1 AND within `windowSec` of it
    * (an un-windowed funnel credits a purchase months after the view;
    * the window is what makes the conversion causal). Semantics are
    * the industry-standard GREEDY-earliest: each stage anchors on the
    * user's earliest valid completion of the previous stage —
    * documented trade: a later step-n completion could occasionally
    * rescue step n+1's window, and greedy deliberately does not
    * backtrack (same single-pass doctrine as the in-batch dedup
    * chains). Same K-narrow-passes shape as [[funnel]]; the window
    * predicate rides the same stage join. Output contract identical
    * to [[funnel]] (t1..tK, funnel_stage). */
  def funnelWindowed(events: DataFrame,
                     steps: Seq[String] = Seq("signup", "view", "purchase"),
                     windowSec: Long = 7L * 86400L): DataFrame = {
    require(steps.nonEmpty && windowSec > 0,
      "funnel needs steps and a positive window")
    val stages = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, i)) =>
        val slice = events.filter(col("event_type") === step)
        val tn = s"t${i + 1}"
        Some(prev match {
          case None =>
            slice.groupBy(col("user_id")).agg(min(col("ts")).as(tn))
          case Some(p) =>
            slice.join(p.select(col("user_id"), col(s"t$i")), Seq("user_id"))
              .filter(col("ts") > col(s"t$i") &&
                unix_micros(col("ts")) <=
                  unix_micros(col(s"t$i")) + windowSec * 1000000L)
              .groupBy(col("user_id")).agg(min(col("ts")).as(tn))
        })
    }.flatten
    val users = events.select(col("user_id")).distinct()
    val joined = stages.foldLeft(users) { (acc, s) =>
      acc.join(s, Seq("user_id"), "left")
    }
    val stage = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
    }
    joined
      .withColumn("funnel_stage", stage.cast("long"))
      .orderBy(col("user_id"))
  }

  /** Per-user event JOURNEY — the path-analysis primitive: each user's
    * events in (ts, event_id) order collapsed to one `a>b>c` path
    * string. One shuffle (groupBy user); the in-group sort happens on
    * the collected array, totally ordered by (ts, event_id, type)
    * struct comparison so ties on ts cannot reorder across engines.
    *
    * Scale caveat (the standard per-entity-sequence one): a user's
    * whole event list materializes in one aggregation buffer, so
    * per-entity cardinality must be application-bounded — true for
    * user sessions (the 100× stress holds per-user density fixed as
    * users scale), NOT for a global key; there is deliberately no
    * journey-over-everything form. */
  def userJourney(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ">").as("journey"))
      .orderBy(col("user_id"))

  /** LAST-TOUCH ATTRIBUTION — each conversion credited to the most
    * recent touch event of the same user within a lookback horizon, the
    * marketing-analytics primitive next to [[funnel]] (which measures
    * ordered reach; attribution measures credited value). The classic
    * formulation is a per-conversion as-of join; joining conversions to
    * touches explodes on active users, so this is instead ONE window
    * pass over the unioned per-user timeline (the [[userJourney]]
    * shuffle reused): `last(touch, ignoreNulls)` over rows strictly
    * before the conversion in (ts, event_id) order gives the as-of
    * touch in a single pass, then the horizon test and the credit
    * aggregation are narrow. One shuffle on user_id, per-user window
    * state O(1) — no per-user list materializes.
    *
    * A conversion with no touch inside the horizon (or none at all)
    * credits the `"__none__"` bucket, so credited + unattributed always
    * reconciles to the conversion count. Credited value is the exact
    * decimal sum of the CONVERSION's value (cast to double at the end —
    * the money doctrine); timestamps compare exactly via interval
    * arithmetic (no epoch truncation). */
  def lastTouchAttribution(events: DataFrame,
                           touches: Seq[String] =
                             Seq("click", "view", "signup"),
                           conversion: String = "purchase",
                           horizon: String = "12 hours"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin(touches.map(lit(_)): _*)
    val withTouch = events
      .withColumn("lt_ts", last(when(isTouch, col("ts")), ignoreNulls = true).over(w))
      .withColumn("lt_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
    withTouch.filter(col("event_type") === conversion)
      .withColumn("touch",
        when(col("lt_ts").isNotNull &&
          col("ts") <= col("lt_ts") + expr(s"INTERVAL $horizon"),
          col("lt_type")).otherwise(lit("__none__")))
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double")
          .as("credited_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("touch"))
  }

  /** MULTI-TOUCH ATTRIBUTION (round 10) — the three classic credit
    * models beside [[lastTouchAttribution]]'s winner-takes-all: each
    * conversion's credit is SPLIT across every touch on the path since
    * the user's previous conversion, under
    *   - `linear_ppm`: equal split,
    *   - `decay_ppm`: exponential time decay (weight 2^(30−k), k =
    *     whole hours from touch to conversion, capped at 30 — a 1-hour
    *     half-life),
    *   - `position_ppm`: U-shaped 40/20/40 (first 40%, last 40%,
    *     middles share 20%).
    *
    * INTEGER-EXACT RECONCILIATION is the design center: credits are
    * parts-per-million longs, each model's floor-division remainder is
    * assigned deterministically (linear/decay: to the LAST touch;
    * position: to the last MIDDLE touch), so every conversion's credits
    * sum to EXACTLY 1_000_000 under every model, on any engine, under
    * any partitioning — the property a float-share formulation can
    * never audit. Decay weights are exact longs (≤ 2^30; the ppm
    * product ≤ 2^50), hour buckets are integer µs division.
    *
    * Shape: touch→conversion assignment is the [[lastTouchAttribution]]
    * single window pass per user timeline REVERSED (first following
    * conversion, ignoreNulls — never a conversions×touches join);
    * per-conversion ranking and remainder assignment are windows
    * partitioned by conversion (bounded groups — a user segment's touch
    * count). Conversions with NO preceding touch emit one null-touch
    * row with full credit under every model, so credited + unattributed
    * reconciles to 1_000_000 × conversions exactly.
    *
    * Output: (conv_event_id, touch_event_id, touch_rank, n_touches,
    * linear_ppm, decay_ppm, position_ppm), ordered. */
  def multiTouchAttribution(events: DataFrame,
                            touches: Seq[String] =
                              Seq("click", "view", "signup"),
                            conversion: String = "purchase"): DataFrame = {
    val wFol = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val isTouch = col("event_type").isin(touches.map(lit(_)): _*)
    val isConv = col("event_type") === conversion
    val withNext = events
      .withColumn("nc_id",
        first(when(isConv, col("event_id")), ignoreNulls = true).over(wFol))
      .withColumn("nc_us",
        first(when(isConv, unix_micros(col("ts"))), ignoreNulls = true).over(wFol))
    val t = withNext.filter(isTouch && col("nc_id").isNotNull)
      .select(col("nc_id").as("conv_event_id"), col("nc_us"),
        col("event_id").as("touch_event_id"),
        unix_micros(col("ts")).as("t_us"))
    val wConv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_event_id"))
    val wOrd = wConv.orderBy(col("t_us"), col("touch_event_id"))
    val ranked = t
      .withColumn("touch_rank", row_number().over(wOrd).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(wConv))
      // whole hours touch→conversion, capped: exact µs integer division
      .withColumn("k", least(expr("(nc_us - t_us) DIV 3600000000"), lit(30L)))
      .withColumn("w", expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - k AS INT))"))
      .withColumn("w_sum", sum(col("w")).over(wConv))
    val n = col("n_touches")
    val rk = col("touch_rank")
    val isLast = rk === n
    val linBase = expr("1000000 DIV n_touches")
    val linear = linBase + when(isLast, lit(1000000L) - n * linBase)
      .otherwise(lit(0L))
    val decBase = expr("(w * 1000000) DIV w_sum")
    val decay = decBase +
      when(isLast, lit(1000000L) - sum(decBase).over(wConv)).otherwise(lit(0L))
    val midBase = expr("200000 DIV (n_touches - 2)")
    val midRem = lit(200000L) - (n - 2) * midBase
    val position = when(n === 1, lit(1000000L))
      .when(n === 2, lit(500000L))
      .when(rk === 1 || isLast, lit(400000L))
      .otherwise(midBase + when(rk === n - 1, midRem).otherwise(lit(0L)))
    val credited = ranked.select(col("conv_event_id"), col("touch_event_id"),
      col("touch_rank"), col("n_touches"),
      linear.as("linear_ppm"), decay.as("decay_ppm"),
      position.as("position_ppm"))
    val noTouch = events.filter(isConv)
      .select(col("event_id").as("conv_event_id"))
      .join(credited.select(col("conv_event_id")).distinct(),
        Seq("conv_event_id"), "left_anti")
      .select(col("conv_event_id"),
        lit(null).cast("long").as("touch_event_id"),
        lit(0L).as("touch_rank"), lit(0L).as("n_touches"),
        lit(1000000L).as("linear_ppm"), lit(1000000L).as("decay_ppm"),
        lit(1000000L).as("position_ppm"))
    credited.unionByName(noTouch)
      .orderBy(col("conv_event_id"), col("touch_rank"))
  }

  /** Bot-detector defaults, shared with the oracle generator (the
    * shared-constants doctrine: threshold changes move both sides). */
  val BotMinGaps: Long = 5L
  val BotSpreadPpm: Long = 100000L

  /** Velocity-rule defaults, shared with the oracle generator. */
  val VelocityWindowUs: Long = 300L * 1000000L
  val VelocityBurstMax: Long = 20L

  /** BURST-VELOCITY FLAG (round 12) — the rate-limit face of abuse
    * detection, complementary to [[botDetect]]'s regularity face: a
    * scraper that randomizes its gaps beats the metronome test but
    * still has to move VOLUME, and "more than N events in any M-minute
    * window" is the classic velocity rule. Per user: total events and
    * the MAXIMUM trailing-window event count (an exact µs RANGE frame
    * (t−M, t] evaluated at every event — the true sliding maximum, not
    * a tumbling approximation), flagged when it exceeds
    * [[VelocityBurstMax]]. All integers; the range frame is per-user,
    * never unpartitioned.
    *
    * Scale shape: one per-user window pass + one map-side-combinable
    * aggregation — the `botDetect` shape with a range frame. */
  def velocityFlag(events: DataFrame,
                   windowUs: Long = VelocityWindowUs,
                   burstMax: Long = VelocityBurstMax): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-(windowUs - 1), 0)
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("burst", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(col("burst")).as("max_burst"))
      .withColumn("is_burst", col("max_burst") > lit(burstMax))
      .orderBy(col("user_id"))
  }

  /** BOT / AUTOMATION DETECTOR (round 12) — the abuse-filtering face of
    * the gap analysis: humans are bursty, schedulers are metronomes, so
    * a user whose inter-event gaps barely vary is overwhelmingly a
    * script — the standard pre-training curation gate against
    * machine-generated event spam, and the exact dual of
    * `event_anomaly`'s outlier hunt (there: big deviations; here:
    * suspiciously small ones).
    *
    * Per user with at least `minGaps` inter-event gaps (exact µs via
    * one (ts, event_id)-ordered window pass — the session-gap
    * primitive): min/max/mean gap and spread_ppm =
    * (max−min)·10⁶ div max(mean,1); flagged when spread_ppm <
    * `spreadPpm` — i.e. the entire gap RANGE is under that fraction of
    * the mean, a bound no organic usage pattern meets over that many
    * events. All arithmetic is BIGINT (mean is a floor div — exact,
    * order-independent), so the flag replays anywhere.
    *
    * Scale shape: one per-user window pass + one map-side-combinable
    * aggregation; output is user-bounded. */
  def botDetect(events: DataFrame, minGaps: Long = BotMinGaps,
                spreadPpm: Long = BotSpreadPpm): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("user_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .as("gap_us"))
      .filter(col("gap_us").isNotNull)
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us")).as("sum_gap_us"))
      .filter(col("n_gaps") >= minGaps)
      .select(col("user_id"), col("n_gaps"), col("min_gap_us"),
        col("max_gap_us"),
        expr("sum_gap_us div n_gaps").as("mean_gap_us"),
        expr("CAST((max_gap_us - min_gap_us) * 1000000 div " +
          "greatest(sum_gap_us div n_gaps, 1L) AS BIGINT)").as("spread_ppm"))
      .withColumn("is_bot", col("spread_ppm") < lit(spreadPpm))
      .orderBy(col("user_id"))
  }
}
