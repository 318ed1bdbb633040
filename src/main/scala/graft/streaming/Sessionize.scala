package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * arbitrary-state operator (SURVEY §2.8 extension surface) for session
  * logic the declarative `session_window` cannot express (per-session
  * custom accumulators, emit-on-close semantics, side conditions).
  * The declarative twin of this operator is the oracle-checked
  * `q_session_windows` (ExtQueries).
  *
  * State per user: the open session's bounds and count. Event-time
  * timeout closes the session when the watermark passes last-event + gap,
  * so state is bounded by the watermark horizon — the 100 TB requirement
  * for any stateful streaming operator.
  */
object Sessionize {

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class OpenSession(start: Timestamp, last: Timestamp, n: Long)
  final case class ClosedSession(user_id: Long, session_start: Timestamp,
      n_events: Long)

  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int,
      watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes.toLong * 60 * 1000

    def fn(uid: Long, evs: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(ClosedSession(uid, s.start, s.n))
      } else {
        val sorted = evs.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[ClosedSession]
        var cur = state.getOption
        sorted.foreach { e =>
          cur = cur match {
            case Some(s) if e.ts.getTime - s.last.getTime < gapMs =>
              Some(OpenSession(s.start, e.ts, s.n + 1))
            case Some(s) =>
              closed ::= ClosedSession(uid, s.start, s.n)
              Some(OpenSession(e.ts, e.ts, 1))
            case None => Some(OpenSession(e.ts, e.ts, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last.getTime + gapMs)
        }
        closed.reverse.iterator
      }
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
