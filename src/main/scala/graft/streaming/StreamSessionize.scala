package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization via flatMapGroupsWithState —
  * custom per-key state with event-time timeouts, the streaming
  * equivalent of operators.Sessionize.
  *
  * State per user is one open session (3 longs) regardless of event
  * volume; the watermark-driven timeout closes and emits sessions, so
  * state size is O(active users), not O(events).
  */
object StreamSessionize {

  case class Event(userId: Long, ts: java.sql.Timestamp)
  case class OpenSession(startMs: Long, lastMs: Long, n: Int)
  case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Int)

  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process(gapMs)) // watermark set by caller
  }

  /** Per-batch group processor: extends the open session with in-gap
    * events, emits closed sessions on a gap or on timeout. Events
    * within a batch are sorted by time (cross-batch order is the
    * watermark's job). */
  private[streaming] def process(gapMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(Session(userId, s.startMs, s.lastMs, s.n))
    } else {
      val sorted = events.map(e => (e.userId, e.ts.getTime)).toSeq.sortBy(_._2)
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { case (_, tsMs) =>
        open = open match {
          case Some(s) if tsMs - s.lastMs <= gapMs =>
            Some(OpenSession(s.startMs, tsMs, s.n + 1))
          case Some(s) =>
            closed += Session(userId, s.startMs, s.lastMs, s.n)
            Some(OpenSession(tsMs, tsMs, 1))
          case None =>
            Some(OpenSession(tsMs, tsMs, 1))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close the session once the watermark passes last event + gap
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      }
      closed.result().iterator
    }
  }
}
