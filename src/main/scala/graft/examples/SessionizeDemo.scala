package graft.examples

import org.apache.spark.sql.functions._

import graft.Engine
import graft.streaming.Sessionize

/** Example: batch sessionization of the events table through the same
  * typed sessionizer the streaming path uses (flatMapGroupsWithState
  * runs in batch mode too — one pass, no state store).
  *
  * Usage: `sbt "runMain graft.examples.SessionizeDemo [sfDir]"`
  */
object SessionizeDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val events = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[Sessionize.Event]

    val sessions = Sessionize.sessions(events)
    // batch mode fires no timeouts, so each user's final still-open
    // session is NOT emitted (q24_sessionize counts those too — expect
    // closed = q24 total minus one open tail per user)
    println("closed sessions (open tails excluded): " + sessions.count())
    println("=== longest sessions ===")
    sessions
      .orderBy(col("n_events").desc, col("user_id"))
      .show(5, truncate = false)
    spark.stop()
  }
}
