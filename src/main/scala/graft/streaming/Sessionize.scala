package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with custom state
  * (`flatMapGroupsWithState`) — the stateful-stream analogue of the
  * batch q24 sessionizer, and the engine's demonstration of
  * KeyValueGroupedDataset custom state (the tool the 30-minute interval
  * buffer of the reference, `/root/reference/src/main.rs:72`, would need
  * if its windows were keyed by activity instead of wall-clock).
  *
  * State per user = the open session (start, last-event, count). A new
  * event either extends it or closes it (gap exceeded) and opens the
  * next; the event-time timeout (watermark past last-event + gap) closes
  * idle sessions without waiting for another event. Emissions are
  * append-mode closed sessions — exactly-once under retry because state
  * transitions are checkpointed with the batch.
  *
  * State size is one small struct per ACTIVE user — bounded by concurrent
  * users, not history; the RocksDB state store holds it at cluster scale.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, event_id: Long)
  case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long)
  case class ClosedSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  private def toUs(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** 30-minute default gap, mirroring the reference's interval. */
  val DefaultGapUs: Long = 1800L * 1000000L

  def update(gapUs: Long)(
      userId: Long,
      rows: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator.single(
        ClosedSession(userId, toTs(s.startUs), toTs(s.lastUs), s.nEvents))
    }
    val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
    var open = state.getOption
    rows.toSeq.sortBy(e => (toUs(e.ts), e.event_id)).foreach { e =>
      val us = toUs(e.ts)
      open match {
        // within [start − gap, last + gap]: extends the open session in
        // either direction (a cross-batch late event just before the
        // session start legitimately pulls the start back)
        case Some(s) if us - s.lastUs <= gapUs && s.startUs - us <= gapUs =>
          open = Some(s.copy(
            startUs = math.min(s.startUs, us),
            lastUs = math.max(s.lastUs, us),
            nEvents = s.nEvents + 1))
        // far in the PAST of the open session: a late straggler from an
        // already-gone session — emit it as its own closed singleton
        // (re-opening history would need unbounded buffering)
        case Some(s) if s.startUs - us > gapUs =>
          closed += ClosedSession(userId, toTs(us), toTs(us), 1L)
        // far in the FUTURE: the open session ended; start the next
        case Some(s) =>
          closed += ClosedSession(userId, toTs(s.startUs), toTs(s.lastUs), s.nEvents)
          open = Some(OpenSession(us, us, 1L))
        case None =>
          open = Some(OpenSession(us, us, 1L))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
    }
    closed.iterator
  }

  /** Sessionize a (possibly streaming) typed event source. The input
    * must carry a watermark on `ts` when streaming (it drives the
    * event-time timeout). */
  def sessions(events: Dataset[Event], gapUs: Long = DefaultGapUs): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update(gapUs))
  }
}
