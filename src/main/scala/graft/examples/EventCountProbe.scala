package graft.examples

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Engine

/** The ×10 EVENT-COUNT scale probe for the STREAMING family (round 10 —
  * the last family without a measured scale axis; doc count was round 9,
  * embedding count earlier this round). Two growth modes, because the
  * streaming claims are different for each:
  *
  *  - **long**: the sf0.1 events replayed as `copies` contiguous
  *    30-day epochs (ts shifted +30 d per copy, event_id offset, SAME
  *    user population returning each epoch), staged as time-ordered
  *    weekly micro-batch files. This is the 100 TB replay shape —
  *    "ingest a year of history through the same checkpoint". The claim
  *    under test: wall time is linear in events (α ≈ 1, per-row cost
  *    flat) while MAX STATE ROWS stay FLAT — the watermark bounds state
  *    by the time-horizon of one batch + the join/dedup horizon, never
  *    by total history length. An engine whose state grew with history
  *    (no watermark eviction) would OOM long before 100 TB.
  *  - **dense**: `copies` user-relabeled copies in the SAME 30-day
  *    range (traffic density ×copies, batch count fixed). The claim:
  *    wall α ≈ 1 and max state grows ∝ ACTIVE KEYS (×copies) — state is
  *    a function of concurrent keys/windows, which a real cluster
  *    scales with `shuffle.partitions`, not of event count.
  *
  * Three stateful operator shapes, mirroring the declared streaming
  * queries: the watermarked 30-min windowed aggregate (q33's stateful
  * core), the stream-stream interval join with per-side watermarks
  * (q39/q42 — the state-heaviest shape: four stores per partition), and
  * `dropDuplicatesWithinWatermark` (q45 — OP-02's bounded-state form).
  * Sinks are `noop` so the probe times the stateful runtime, not a
  * parquet writer. Max state rows come from the query's
  * `recentProgress` `stateOperators.numRowsTotal` (the store's own
  * census), read synchronously after termination.
  *
  * Usage: `sbt "runMain graft.examples.EventCountProbe [copies]"`
  * (default 10). α = log(t_big / t_base) / log(copies). */
object EventCountProbe {
  private val Base = "/root/testdata/sf0.1"
  private val DayMs = 86400000L

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")

    val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "window_agg" -> windowAgg,
      "interval_join" -> intervalJoin,
      "dedup_watermark" -> dedupWatermark)

    for (mode <- Seq("long", "dense")) {
      val baseDir = stage(spark, mode, 1)
      val bigDir = stage(spark, mode, copies)
      println(s"== mode=$mode: base=1 copy vs big=$copies copies ==")
      for ((name, shape) <- shapes) {
        val (tB, rowsB, stateB) = run(spark, baseDir, shape)
        val (tX, rowsX, stateX) = run(spark, bigDir, shape)
        val alpha = math.log(tX / tB) / math.log(copies.toDouble)
        println(f"[probe] $mode/$name base=$tB%.2fs (rows=$rowsB state_max=$stateB) " +
          f"x$copies=$tX%.2fs (rows=$rowsX state_max=$stateX) " +
          f"alpha=$alpha%.2f state_ratio=${stateX.toDouble / stateB}%.2f")
      }
    }
    spark.stop()
  }

  /** The staged source: weekly micro-batch files per 30-day epoch, mtime
    * pinning the file-source order to time order (the replay harness's
    * discipline — watermarks only evict when batches arrive in event-time
    * order, exactly how a production backfill replays history). */
  private def stage(spark: SparkSession, mode: String, copies: Int): String = {
    val root = Files.createTempDirectory(s"graft_evprobe_${mode}_$copies")
    root.toFile.deleteOnExit()
    val src = Files.createDirectory(root.resolve("src"))
    val ev = spark.read.parquet(s"$Base/events.parquet")
      .select("event_id", "ts", "user_id", "event_type")
    val t0 = to_timestamp(lit("2024-01-01 00:00:00"))
    var mtime = 1000000000000L
    // Weekly slices of the base range; [22, 31) is the fat tail slice.
    val slices = Seq((0, 8), (8, 15), (15, 22), (22, 31))
    def slice(lo: Int, hi: Int) = ev.filter(
      col("ts") >= t0 + expr(s"interval $lo days") &&
        col("ts") < t0 + expr(s"interval $hi days"))
    if (mode == "long") {
      // One file per (epoch, week), epochs tiling forward in time:
      // 4×copies batches, each the same time-width and row count as a
      // base batch — history grows, per-batch density does not.
      for (c <- 0 until copies; (lo, hi) <- slices) {
        val copy = slice(lo, hi).select(
          (col("event_id") + lit(c.toLong * 10000000L)).as("event_id"),
          (col("ts") + expr(s"interval ${c * 30} days")).as("ts"),
          col("user_id"), col("event_type"))
        stageFile(copy, root, src, s"c${c}_s$lo", mtime)
        mtime += 60000L
      }
    } else {
      // Dense: each weekly batch is the UNION of the user-relabeled
      // copies — 4 batches like the base run, each ×copies denser. The
      // union MUST ride in one file per slice: staged as per-copy files
      // the second copy of week w would arrive after the watermark
      // already passed w (watermarks are monotonic) and be dropped as
      // late data — the probe would measure the drop path, not density.
      for ((lo, hi) <- slices) {
        val unioned = (0 until copies).map { c =>
          slice(lo, hi).select(
            (col("event_id") + lit(c.toLong * 10000000L)).as("event_id"),
            col("ts"),
            (col("user_id") + lit(c.toLong * 1000000L)).as("user_id"),
            col("event_type"))
        }.reduce(_ unionAll _)
        stageFile(unioned, root, src, s"s$lo", mtime)
        mtime += 60000L
      }
    }
    src.toString
  }

  private def stageFile(
      df: DataFrame, root: Path, dir: Path, name: String, mtimeMs: Long): Unit = {
    val tmp = root.resolve(s"stage_$name")
    df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val part = try listing.filter(_.toString.endsWith(".parquet")).findFirst.get
    finally listing.close()
    val dst = Files.copy(part, dir.resolve(s"$name.parquet"))
    Files.setLastModifiedTime(
      dst, java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    ()
  }

  /** One stream execution: AvailableNow over the staged files, one file
    * per trigger, noop sink; returns (wall s, input rows, max state rows
    * over all batches and operators). A fresh cloned session per run —
    * 1 shuffle partition for the same reason the Replay harness uses it
    * (state here is keys × windows, tiny; partitions × batches is the
    * store-commit count). */
  private def run(
      spark0: SparkSession, srcDir: String,
      shape: DataFrame => DataFrame): (Double, Long, Long) = {
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val ckp = Files.createTempDirectory("graft_evprobe_ckp")
    ckp.toFile.deleteOnExit()
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val t0 = System.nanoTime()
    val q = shape(stream).writeStream.format("noop")
      .option("checkpointLocation", ckp.toString)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    // Census from recentProgress, read synchronously AFTER termination —
    // a StreamingQueryListener delivers events on an async bus, so the
    // last batch's progress (often the state peak) can still be in
    // flight when awaitTermination returns. Default retention is 100
    // progress entries; the longest probe run here is ~41 batches, so
    // nothing has rotated out (asserted).
    val progs = q.recentProgress
    require(progs.length < 95,
      s"recentProgress near retention limit (${progs.length}) — census would truncate")
    val rows = progs.map(_.numInputRows).sum
    val maxState = (0L +: progs.map(_.stateOperators.map(_.numRowsTotal).sum)).max
    (secs, rows, maxState)
  }

  /** q33's stateful core: watermark + 30-min tumbling count per
    * (event_type, window). State = windows-in-flight × types. */
  private def windowAgg(s: DataFrame): DataFrame =
    s.withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count("*").as("n"), approx_count_distinct("user_id").as("users"))

  /** q39/q42's shape: clicks ⋈ views on user within a 12 h interval,
    * both sides watermarked — the four-store-per-partition operator. */
  private def intervalJoin(s: DataFrame): DataFrame = {
    val clicks = s.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("cts"), col("user_id"))
      .withWatermark("cts", "1 minute")
    val views = s.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("vts"),
        col("user_id").as("v_user_id"))
      .withWatermark("vts", "1 minute")
    clicks.join(views,
      col("user_id") === col("v_user_id") && col("vts") <= col("cts") &&
        col("vts") >= col("cts") - expr("interval 12 hours"))
  }

  /** q45's shape: OP-02's bounded-state streaming dedup — state holds
    * only keys within the watermark horizon. */
  private def dedupWatermark(s: DataFrame): DataFrame =
    s.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
}
