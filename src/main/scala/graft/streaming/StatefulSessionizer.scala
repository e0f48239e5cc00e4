package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState`
  * (SURVEY §7.4 H6 — the [EXT] stateful-streaming surface): per-user
  * session state lives in the state store, sessions close when the
  * event-time watermark passes their gap, and closed sessions are
  * emitted downstream.
  *
  * This is the streaming twin of the batch `events_sessionize` query
  * (gaps-and-islands): same 30-minute inactivity gap, same
  * (user, start, n_events) output, but incremental — state is
  * O(open sessions), not O(history), which is what makes it run
  * indefinitely on an unbounded stream.
  */
object StatefulSessionizer {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Timestamp, last: Timestamp, n: Long, value: Double)
  case class Session(user_id: Long, session_start: Timestamp, n_events: Long, session_value: Double)

  val GapMs: Long = 30 * 60 * 1000

  private def updateState(userId: Long, events: Iterator[Event],
                          state: GroupState[SessionState]): Iterator[Session] = {
    // timeout invocation: the watermark passed last+gap with no new
    // events — close and emit the session, nothing else to do
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.start, s.n, s.value))
    }
    var closed = List.empty[Session]
    var cur = state.getOption
    // events within one trigger arrive unordered: sort by event time
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      cur match {
        case Some(s) if e.ts.getTime - s.last.getTime <= GapMs =>
          // a late in-gap event must not regress the session bounds —
          // `last` keeps the max (else the timeout window shrinks and a
          // real session gets split), `start` keeps the min
          cur = Some(s.copy(
            start = if (e.ts.before(s.start)) e.ts else s.start,
            last = if (e.ts.after(s.last)) e.ts else s.last,
            n = s.n + 1, value = s.value + e.value))
        case Some(s) =>
          closed ::= Session(userId, s.start, s.n, s.value)
          cur = Some(SessionState(e.ts, e.ts, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts, e.ts, 1, e.value))
      }
    }
    cur match {
      case Some(s) =>
        state.update(s)
        // close the session once the watermark passes last + gap; if the
        // watermark already has (a far-newer event in the same trigger),
        // schedule for the next trigger — timeouts may not be set behind
        // the current watermark
        state.setTimeoutTimestamp(
          math.max(s.last.getTime + GapMs, state.getCurrentWatermarkMs() + 1))
      case None => ()
    }
    closed.reverseIterator
  }

  /** Wire the sessionizer over a streaming (or batch) events Dataset.
    * Emits a session row when the watermark closes it.
    */
  def sessions(spark: SparkSession, events: Dataset[Event],
               lateness: String = "1 minute"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateState)
  }
}
