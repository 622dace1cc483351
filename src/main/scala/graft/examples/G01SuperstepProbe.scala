package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.Engine

/** The graph family's third-decade RECEIPT (round-16 verdict task 3):
  * one g01 PageRank superstep at sf100 under the width policy, with
  * PER-TASK shuffle/spill bytes — the per-executor bill the "a
  * 1000-executor cluster spreads ~1.5 TB to ~1.5 GB each" story
  * quotes, measured instead of argued.
  *
  * Structure mirrors production g01 (GraphQueries.scala:40) but
  * splits the one-time graph BUILD from the per-iteration work so the
  * superstep receipt is clean:
  *
  *  1. BUILD (once per graph, amortized over k supersteps): the
  *     distinct bipartite edge set + degree join, written to PARQUET
  *     (not localCheckpoint — a disk-bounded artifact the one-box
  *     probe can afford; production's in-memory checkpoint is the
  *     cluster luxury this box does not have; r16's full-g01 attempt
  *     died exactly there at 9.3 GB disk free).
  *  2. SUPERSTEP (the receipt): read ew, init ranks, ONE
  *     contributions join + agg + noop. Every stage's task-level
  *     shuffle-read/write, spill, and wall are printed as the stage
  *     completes (kill-robust: a dead run still leaves the rows
  *     printed so far).
  *
  * Run: `SPARK_GRAFT_SF_DIR=/tmp/sf100 sbt "runMain
  *   graft.examples.G01SuperstepProbe /tmp/sf100 /tmp/g01_ew"` */
object G01SuperstepProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
    val ewDir = args.lift(1).getOrElse("/tmp/g01_ew")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val width = Engine.tuneForEstate(spark, d)
    println(s"estate=$d width=$width")

    // per-stage task stats, printed at stage completion
    val stats = new java.util.concurrent.ConcurrentHashMap[Int,
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val buf = stats.computeIfAbsent(t.stageId,
            _ => scala.collection.mutable.ArrayBuffer.empty)
          buf.synchronized {
            buf += ((
              m.shuffleWriteMetrics.bytesWritten,
              m.shuffleReadMetrics.totalBytesRead,
              m.memoryBytesSpilled + m.diskBytesSpilled,
              m.executorRunTime))
          }
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val id = s.stageInfo.stageId
        val buf = stats.getOrDefault(id,
          scala.collection.mutable.ArrayBuffer.empty)
        val rows = buf.synchronized(buf.toVector)
        if (rows.nonEmpty) {
          def pct(v: Seq[Long], p: Double): Long =
            if (v.isEmpty) 0L else v.sorted.apply(
              math.min(v.size - 1, (p * v.size).toInt))
          val (w, r, sp, rt) = (rows.map(_._1), rows.map(_._2),
            rows.map(_._3), rows.map(_._4))
          println(f"stage=$id%-4d name=${s.stageInfo.name.take(40)}%-40s " +
            f"tasks=${rows.size}%-5d " +
            f"shufW_MB tot=${w.sum >> 20}%-7d p50=${pct(w, .5) >> 20}%-5d " +
            f"p99=${pct(w, .99) >> 20}%-5d max=${w.max >> 20}%-5d " +
            f"shufR_MB tot=${r.sum >> 20}%-7d max=${r.max >> 20}%-5d " +
            f"spill_MB tot=${sp.sum >> 20}%-7d max=${sp.max >> 20}%-5d " +
            f"task_s max=${rt.max / 1000.0}%.1f")
        }
      }
    })

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      println(f"== $label wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      out
    }

    // ---- 1. BUILD: (src, dst, deg), written once ----
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(ewDir))) {
      timed("build_ew") {
        val pairs = spark.read.parquet(s"$d/lineitem.parquet")
          .select(col("l_orderkey").as("ok"),
            (col("l_suppkey") + lit(1000000L)).as("supp"))
          .join(spark.read.parquet(s"$d/orders.parquet")
            .select(col("o_orderkey").as("ok"), col("o_custkey").as("cust")),
            "ok")
          .select("supp", "cust").distinct()
        val edges = pairs.select(col("supp").as("src"), col("cust").as("dst"))
          .unionAll(pairs.select(col("cust").as("src"), col("supp").as("dst")))
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        edges.join(deg, "src").write.parquet(ewDir)
      }
    } else println(s"build_ew: reusing $ewDir")

    // ---- 2. ONE SUPERSTEP over the materialized edge table ----
    timed("superstep") {
      val ew = spark.read.parquet(ewDir)
      val n = ew.select(countDistinct("src").as("n"))
      val init = ew.select(col("src").as("id")).distinct()
        .crossJoin(broadcast(n))
        .select(col("id"), (lit(1.0) / col("n")).as("r"))
      ew.join(init, ew("src") === init("id"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("r") / col("deg")).as("m"))
        .crossJoin(broadcast(n))
        .select(col("id"), (lit(0.15) / col("n") + lit(0.85) * col("m")).as("r"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
