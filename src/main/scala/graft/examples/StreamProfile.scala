package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.Tables

/** Per-micro-batch cost profile of the replay-shaped streaming queries —
  * the diagnostic behind the replay session's tuning choices (state
  * partition count, batch count). Runs a q42-shaped stream-stream
  * left-outer interval join over N staged micro-batch files and prints
  * each batch's `durationMs` breakdown (addBatch / getBatch /
  * queryPlanning / walCommit / commitOffsets / stateful-op commit), the
  * numbers that tell you whether micro-batch cost is data or fixed
  * overhead. Usage: `runMain graft.examples.StreamProfile [sfDir]`.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        println(s"[profile] batch=${p.batchId} total=${dur.get("triggerExecution")}ms " +
          s"addBatch=${dur.get("addBatch")} getBatch=${dur.get("getBatch")} " +
          s"latestOffset=${dur.get("latestOffset")} planning=${dur.get("queryPlanning")} " +
          s"walCommit=${dur.get("walCommit")} commitOffsets=${dur.get("commitOffsets")} " +
          s"rows=${p.numInputRows}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    val root = Files.createTempDirectory("graft_profile")
    val src = Files.createDirectory(root.resolve("src"))
    val ev = Tables.events(spark, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val (cut1, cut2) =
      (lit("2024-01-11").cast("timestamp"), lit("2024-01-21").cast("timestamp"))
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtimeMs: Long): Unit = {
      val tmp = root.resolve(s"stage_$name")
      df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part = try listing.filter(_.toString.endsWith(".parquet")).findFirst.get
      finally listing.close()
      val dst = Files.copy(part, src.resolve(s"$name.parquet"))
      Files.setLastModifiedTime(
        dst, java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    stage(ev.filter(col("ts") < cut1), "b0", 1000000000000L)
    stage(ev.filter(col("ts") >= cut1 && col("ts") < cut2), "b1", 1000000060000L)
    stage(ev.filter(col("ts") >= cut2), "b2", 1000000120000L)

    val t0 = System.nanoTime()
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("cts"), col("user_id"))
      .withWatermark("cts", "1 minute")
    val views = stream.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("vts"),
        col("user_id").as("v_user_id"))
      .withWatermark("vts", "1 minute")
    val q = clicks.join(views,
        col("user_id") === col("v_user_id") && col("vts") <= col("cts") &&
          col("vts") >= col("cts") - expr("interval 12 hours"), "leftOuter")
      .writeStream.format("parquet")
      .option("path", root.resolve("out").toString)
      .option("checkpointLocation", root.resolve("ckp").toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    println(f"[profile] stream total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
