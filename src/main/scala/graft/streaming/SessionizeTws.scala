package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

import Sessionize.{ClosedSession, Event, OpenSession}

/** Gap-based sessionization on `transformWithState` — Spark 4's
  * arbitrary-stateful-processing API (the successor to
  * `flatMapGroupsWithState`, SPARK-46815): typed state variables from a
  * handle, first-class event-time timers instead of a single
  * per-key timeout, and the RocksDB state store required/assumed.
  *
  * SEMANTICS ARE IDENTICAL to [[Sessionize]]: both call the same pure
  * [[Sessionize.mergeIntervals]] core, so the two runtimes cannot drift
  * (the spec runs the same scenario through both and diffs the output).
  * The [[Sessionize.ClosedSession]] output contract — possible overlap
  * under late data — applies unchanged.
  *
  * What the new API buys at scale: per-key timers are managed by the
  * store (no timeout-rearm dance, several timers per key possible),
  * state variables are individually evolvable (add a ListState next to
  * the ValueState without migrating the whole struct), and TTL is
  * declarative ([[TTLConfig]]) instead of hand-rolled.
  */
object SessionizeTws {

  /** One open-session ValueState per user + one event-time timer at
    * (last event + gap); the timer closes idle sessions. */
  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, Event, ClosedSession] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long,
        rows: Iterator[Event],
        timers: TimerValues): Iterator[ClosedSession] = {
      val existing = if (open.exists()) Some(open.get()) else None
      val (closed, latestOpt) = Sessionize.mergeIntervals(
        gapUs, existing, rows.map(Sessionize.eventInterval).toSeq)
      latestOpt.foreach { latest =>
        open.update(latest)
        // one live timer per key: drop the stale (earlier) one, arm at
        // last-event + gap, clamped ahead of the watermark so a
        // straggler batch can't arm a timer that never fires
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(math.max(
          latest.lastUs / 1000L + gapUs / 1000L,
          timers.getCurrentWatermarkInMs() + 1L))
      }
      closed.iterator.map(Sessionize.toClosed(userId, _))
    }

    override def handleExpiredTimer(
        userId: Long,
        timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (open.exists()) {
        val s = open.get()
        open.clear()
        Iterator.single(Sessionize.toClosed(userId, s))
      } else Iterator.empty
  }

  /** Sessionize a streaming typed event source (requires a watermark on
    * `ts` — it drives the event-time timers — and the RocksDB state
    * store provider, which `transformWithState` mandates). Emitted
    * sessions may overlap under late data ([[Sessionize.ClosedSession]]
    * contract). */
  def sessions(
      events: Dataset[Event],
      gapUs: Long = Sessionize.DefaultGapUs): Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new SessionProcessor(gapUs),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
