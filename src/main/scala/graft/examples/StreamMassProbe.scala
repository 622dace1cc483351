package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Adversarial-mass + state-size census for the stateful streaming
  * family — the q54 lesson (PLANS.md round 11: "every streaming
  * operator needs its adversarial-mass probe run BEFORE it ships,
  * because the batch family's caps do not ride along") applied to the
  * OTHER stateful operators, plus the numeric state-store census the
  * watermark tests only pinned indirectly.
  *
  * Four operators, each the exact shape its query runs (cited):
  *  - sessionize — `flatMapGroupsWithState` via
  *    [[graft.streaming.Sessionize.sessions]] (q36/q43's operator)
  *  - ssjoin — the watermarked stream-stream interval join (q39/q42's
  *    12-hour same-user shape)
  *  - dedup — `dropDuplicatesWithinWatermark` on event_id (q45)
  *  - winagg — the 30-minute tumbling window count (q33 / OP-08)
  *
  * Two axes per operator:
  *  - hot(N): ONE key carrying N events inside a single gap/window/
  *    watermark — the template-mass attack that found q54's |copies|²
  *    quadratic. For the join, the hot user appears on BOTH sides
  *    (N views + N clicks in one interval window), so the SEMANTICS
  *    demand N² output pairs — the probe separates state growth
  *    (bounded) from output mass (the oracle's own answer size).
  *  - uniform(N): N events over 100 users — the ×1/×10 census axis.
  *
  * Per run it reports wall seconds, emitted rows, and the state
  * operator's own progress metrics (max numRowsTotal / memoryUsedBytes
  * across batches — read from `query.recentProgress`, the number the
  * RocksDB store would hold per partition at deployment).
  *
  * Staging mirrors the queries' replay discipline: single-file parquet
  * batches with pinned mtimes (file-source processing order), a
  * far-future sentinel as the last batch so watermarks flush every
  * window/timeout, `noDataMicroBatches` off, shuffle partitions 1.
  */
object StreamMassProbe {

  private def stage(df: DataFrame, dir: String, name: String, mtimeMs: Long): Unit = {
    val tmp = s"$dir/stage_$name"
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp))
      .filter(_.toString.endsWith(".parquet")).findFirst.get
    val dst = Files.copy(part, Paths.get(dir, s"$name.parquet"))
    Files.setLastModifiedTime(
      dst, java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    // the copied data file is the only survivor
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  /** events: one hot key with `hot` events 1 s apart + `bg` background
    * events over 100 users spread across hours. */
  private def eventsDf(s: SparkSession, hot: Long, bg: Long): DataFrame = {
    val base = lit("2024-01-01 00:00:00").cast("timestamp")
    val hotDf = s.range(hot).select(
      col("id").as("event_id"),
      (unix_timestamp(base) + col("id") % 1500).cast("timestamp").as("ts"),
      lit(0L).as("user_id"),
      when(col("id") % 2 === 0, "view").otherwise("click").as("event_type"),
      (col("id") % 97).cast("double").as("value"))
    val bgDf = s.range(1000000, 1000000 + bg).select(
      col("id").as("event_id"),
      (unix_timestamp(base) + (col("id") % 86400) * 3).cast("timestamp").as("ts"),
      (col("id") % 100 + 1).as("user_id"),
      when(col("id") % 2 === 0, "view").otherwise("click").as("event_type"),
      (col("id") % 97).cast("double").as("value"))
    hotDf.unionAll(bgDf)
  }

  /** TWO sentinel batches, not one: the watermark a batch runs under is
    * derived from the PREVIOUS batch's max event time, so the batch that
    * carries the far-future row only ADVANCES the watermark — the
    * timeouts/window-finalizations it unlocks fire in the batch AFTER
    * it. One sentinel under AvailableNow (which stops at the last file)
    * leaves sessions and windows in state, never emitted. */
  private def sentinel(s: SparkSession, day: Int): DataFrame =
    s.range(1).select(
      lit(-99L - day).as("event_id"),
      lit(f"2030-01-0$day%d 00:00:00").cast("timestamp").as("ts"),
      lit(-1L).as("user_id"), lit("view").as("event_type"),
      lit(0.0).as("value"))

  def main(args: Array[String]): Unit = {
    val outer = graft.Engine.session()
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
      "event_type STRING, value DOUBLE"
    println(f"${"operator"}%-10s ${"shape"}%-14s ${"wall_s"}%7s ${"out_rows"}%9s " +
      f"${"state_rows"}%10s ${"state_mb"}%8s")

    val shapes = Seq(
      ("hot", 1000L, 0L), ("hot", 10000L, 0L), ("hot", 100000L, 0L),
      ("uniform", 0L, 1000L), ("uniform", 0L, 10000L))
    for ((op, idx) <- Seq("sessionize", "ssjoin", "dedup", "winagg", "hopwin").zipWithIndex;
         (kind, hot, bg) <- shapes) {
      // the join's output is quadratic in the hot mass BY SEMANTICS —
      // cap its hot axis where the oracle's own answer explodes
      if (op != "ssjoin" || hot <= 10000L) {
        val s = outer.newSession()
        s.conf.set("spark.sql.shuffle.partitions", "1")
        s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        val tag = s"${op}_${kind}_${hot + bg}"
        val root = s"/tmp/streammass_${ProcessHandle.current().pid()}/$tag"
        Files.createDirectories(Paths.get(s"$root/src"))
        stage(eventsDf(s, hot, bg), s"$root/src", "batch0", 1000000000000L)
        stage(sentinel(s, 1), s"$root/src", "batch1", 1000000060000L)
        stage(sentinel(s, 2), s"$root/src", "batch2", 1000000120000L)
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$root/src")
        val out = op match {
          case "sessionize" =>
            import s.implicits._
            graft.streaming.Sessionize.sessions(
              stream.select(col("user_id"), col("ts"), col("event_id"))
                .withWatermark("ts", "1 minute")
                .as[graft.streaming.Sessionize.Event])
              .toDF()
          case "ssjoin" =>
            val clicks = stream.filter(col("event_type") === "click")
              .select(col("event_id").as("click_id"), col("ts").as("cts"),
                col("user_id"))
              .withWatermark("cts", "1 minute")
            val views = stream.filter(col("event_type") === "view")
              .select(col("event_id").as("view_id"), col("ts").as("vts"),
                col("user_id").as("v_user_id"))
              .withWatermark("vts", "1 minute")
            clicks.join(views,
              col("user_id") === col("v_user_id") &&
                col("vts") <= col("cts") &&
                col("vts") >= col("cts") - expr("interval 12 hours"))
          case "dedup" =>
            // q45's operator under key mass: every hot event carries
            // the SAME event_id (re-sent N times within the watermark)
            stream
              .withColumn("event_id",
                when(col("user_id") === 0L, lit(7L)).otherwise(col("event_id")))
              .withWatermark("ts", "1 minute")
              .dropDuplicatesWithinWatermark("event_id")
          case "winagg" =>
            stream.withWatermark("ts", "1 minute")
              .groupBy(window(col("ts"), "30 minutes"), col("user_id"))
              .agg(count(lit(1)).as("n"), sum("value").as("sv"))
          case "hopwin" =>
            // q57's operator: the 3-pane Expand means hot mass lands in
            // 3 open panes instead of 1 — state must stay 3×panes, not
            // grow with events
            stream.withWatermark("ts", "1 minute")
              .groupBy(window(col("ts"), "30 minutes", "10 minutes"),
                col("user_id"))
              .agg(count(lit(1)).as("n"), sum("value").as("sv"))
        }
        val t0 = System.nanoTime()
        val q = out.writeStream
          .format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckp")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        val progress = q.recentProgress.toSeq
        val stateRows = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
          .foldLeft(0L)(math.max)
        val stateMb = progress.flatMap(_.stateOperators.map(_.memoryUsedBytes))
          .foldLeft(0L)(math.max) / 1e6
        val outRows = s.read.parquet(s"$root/out").count()
        val shapeCol = s"$kind(${hot + bg})"
        println(f"$op%-10s $shapeCol%-14s $wall%7.2f $outRows%9d " +
          f"$stateRows%10d $stateMb%8.2f")
      }
    }
    outer.stop()
  }
}
