package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Sessionize, SessionizeTws}
import graft.streaming.Sessionize.Event

/** The transformWithState sessionizer must reproduce the
  * flatMapGroupsWithState one on the same scenario — both delegate to
  * `Sessionize.mergeIntervals`, this spec proves the runtime plumbing
  * (state variable, timers, watermark clamp) agrees too. */
class SessionizeTwsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tws sessions: gap split, cross-batch continuation, timer closure") {
    // transformWithState mandates the RocksDB state store provider
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Event]
    val sessions = SessionizeTws.sessions(
      ms.toDS().withWatermark("ts", "0 seconds").as[Event])
    val query = sessions.writeStream
      .format("memory")
      .queryName("tws_sessions")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // same scenario as SessionizeSpec: user 1 bursts twice >30 min
      // apart in one batch, user 2 goes idle
      ms.addData(
        Event(1L, ts("2024-01-01 10:00:00"), 1L),
        Event(1L, ts("2024-01-01 10:10:00"), 2L),
        Event(1L, ts("2024-01-01 11:00:00"), 3L),
        Event(2L, ts("2024-01-01 10:05:00"), 4L))
      query.processAllAvailable()
      val afterBatch1 = spark.table("tws_sessions").as[Sessionize.ClosedSession].collect()
      assert(afterBatch1.toSet == Set(
        Sessionize.ClosedSession(1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L),
        Sessionize.ClosedSession(2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:05:00"), 1L)),
        s"got ${afterBatch1.toSet}")

      // extend user 1's open session across batches, then advance the
      // watermark far past it → the timer closes the 3-event session
      ms.addData(Event(1L, ts("2024-01-01 11:20:00"), 5L))
      query.processAllAvailable()
      ms.addData(Event(99L, ts("2024-01-01 20:00:00"), 6L))
      query.processAllAvailable()
      ms.addData(Event(99L, ts("2024-01-02 09:00:00"), 7L))
      query.processAllAvailable()

      val all = spark.table("tws_sessions").as[Sessionize.ClosedSession].collect().toSet
      assert(all.contains(
        Sessionize.ClosedSession(1L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:20:00"), 2L)),
        s"user 1's extended session should close via timer; got $all")
    } finally {
      query.stop(); query.awaitTermination()
      spark.sql("DROP TABLE IF EXISTS tws_sessions")
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
