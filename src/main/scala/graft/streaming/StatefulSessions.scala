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
      val times = evs.map(_.ts.getTime).toArray.sorted
      var open = state.getOption
      val closed = Vector.newBuilder[Session]
      times.foreach { t =>
        open match {
          case Some(s) if t - s.lastMs < gapMs =>
            open = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
          case Some(s) =>
            closed += toSession(uid, s, gapMs)
            open = Some(OpenSession(t, t, 1))
          case None =>
            open = Some(OpenSession(t, t, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      }
      closed.result().iterator
    }
  }
}
