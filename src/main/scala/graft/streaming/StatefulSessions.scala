package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization: the KeyValueGroupedDataset
  * `flatMapGroupsWithState` form of B5, for session semantics the
  * built-in `session_window` can't express (e.g. emitting per-session
  * aggregates only on close, carrying arbitrary state across
  * micro-batches).
  *
  * State machine per user: an open session (start, last, count). Each
  * micro-batch folds its (sorted) events in, closing a session whenever
  * the in-batch gap exceeds the threshold; the open tail is kept in state
  * with an event-time timeout of `gap` past the last event — when the
  * watermark passes that, the timed-out callback emits the final session.
  * Exactly the reference's block-barrier pattern (accumulate → flush on
  * boundary) lifted to event time.
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  case class Session(user_id: Long, sess_start: java.sql.Timestamp,
                     sess_end: java.sql.Timestamp, n_events: Long)

  def sessionize(events: Dataset[Ev], gapMs: Long,
                 watermark: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(processGroup(gapMs))
  }

  private def toSession(uid: Long, s: OpenSession, gapMs: Long): Session =
    Session(uid, new java.sql.Timestamp(s.startMs),
      new java.sql.Timestamp(s.lastMs + gapMs), s.n)

  private def processGroup(gapMs: Long)(
      uid: Long, evs: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val closed = state.getOption.map(toSession(uid, _, gapMs))
      state.remove()
      closed.iterator
    } else {
      // Build this batch's sessions from its sorted events (gap splits),
      // then interval-merge with the carried open session — so a late
      // event landing before or inside the open session extends it with
      // the CORRECT start time instead of being swallowed. Only the
      // latest session stays open in state; earlier ones close now (an
      // event above the watermark but older than an already-emitted
      // session is the one case single-open-session state cannot repair).
      val times = evs.map(_.ts.getTime).toArray.sorted
      val batchSessions = Vector.newBuilder[OpenSession]
      var cur: Option[OpenSession] = None
      times.foreach { t =>
        cur match {
          case Some(s) if t - s.lastMs < gapMs =>
            cur = Some(s.copy(lastMs = t, n = s.n + 1))
          case Some(s) =>
            batchSessions += s
            cur = Some(OpenSession(t, t, 1))
          case None =>
            cur = Some(OpenSession(t, t, 1))
        }
      }
      val pieces = (batchSessions.result() ++ cur.toVector ++
        state.getOption.toVector).sortBy(s => (s.startMs, s.lastMs))
      val merged = pieces.foldLeft(Vector.empty[OpenSession]) { (acc, s) =>
        acc.lastOption match {
          case Some(p) if s.startMs - p.lastMs < gapMs =>
            acc.init :+ OpenSession(p.startMs,
              math.max(p.lastMs, s.lastMs), p.n + s.n)
          case _ => acc :+ s
        }
      }
      val closed = merged.dropRight(1).map(toSession(uid, _, gapMs))
      merged.lastOption.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      }
      closed.iterator
    }
  }
}
