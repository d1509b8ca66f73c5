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
object Sessionize extends Serializable {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class SessionState(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Int)

  /** Fold a sorted event batch into the per-user state, emitting every
    * session the gap rule closes. */
  private def foldEvents(userId: Long, gapMs: Long, sorted: Seq[Event],
                         init: Option[SessionState])
      : (Seq[Session], Option[SessionState]) = {
    var cur = init
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
    (closed.result(), cur)
  }

  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    val gapMs = gapMinutes * 60000L

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      val (closed, cur) = foldEvents(userId, gapMs,
        rows.toSeq.sortBy(_.ts.getTime), state.getOption)
      cur.foreach(state.update)
      closed.iterator
    }

    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming sessionization WITH trailing-session flush: the same gap
    * rule, but the open session is registered for an event-time timeout
    * at `last + gap`, so once the WATERMARK passes that point the idle
    * user's session is emitted and its state dropped — no key lingers
    * forever. State size stays ∝ users active within the watermark
    * horizon; the watermark delay is the lateness tolerance.
    */
  def sessionizeEventTime(events: Dataset[Event], gapMinutes: Int = 30,
                          watermarkDelay: String = "10 minutes")
      : Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    val gapMs = gapMinutes * 60000L

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // watermark passed last+gap with no new events: flush and drop
        val s = state.get
        state.remove()
        Iterator(Session(userId, new Timestamp(s.start),
          new Timestamp(s.last), s.n))
      } else {
        val (closed, cur) = foldEvents(userId, gapMs,
          rows.toSeq.sortBy(_.ts.getTime), state.getOption)
        cur.foreach { s =>
          state.update(s)
          // a timeout timestamp at-or-before the watermark is rejected;
          // late-arriving batches clamp to just past it (flushing at the
          // next trigger, the earliest legal moment)
          state.setTimeoutTimestamp(
            math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        closed.iterator
      }
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
