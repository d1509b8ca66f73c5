package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization with custom keyed state
  * (`flatMapGroupsWithState`) — the engine's "custom state machine"
  * streaming surface (SURVEY.md §2.6 T7 has no reference-mandated
  * semantics, so this is forward-looking API).
  *
  * A session closes when the next event of the same user arrives more
  * than `gapMinutes` after the previous one; the closed session is
  * emitted then. The trailing open session stays in state (in production
  * an event-time timeout with a watermark would flush it; kept
  * next-event-closed here so batch tests are deterministic).
  *
  * Scale: state is one small record per active user key, partitioned by
  * the stream's keyed shuffle; memory is bounded by active users, not
  * event volume.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class SessionState(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int)

  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    val gapMs = gapMinutes * 60000L

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var cur = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last > gapMs =>
            closed += Session(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n)
            cur = Some(SessionState(t, t, 1))
          case Some(s) =>
            cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach(state.update)
      closed.result().iterator
    }

    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
