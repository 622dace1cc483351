package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Engine

/** Stage breakdown for g04's sf10 residual (α≈1.2 even after the
  * posting-list rewrite): attributes wall-clock to (1) the edge
  * pipeline — join, one pk exchange, co-located distinct, window cap;
  * (2) posting-list build + combinations explode (pair emission, no
  * aggregation); (3) + the pair-mass groupBy (the hash-agg over
  * ~C(b,2)·|parts| mostly-unique keys — the spill suspect); and counts
  * the actual pair mass so "mass grew super-linearly" vs "same mass,
  * slower agg" is a measurement, not a guess.
  *
  * Round 15 adds the CLOSING receipt the round-14 verdict asked for:
  * (a) the PACKED single-long pair key (`ca << 32 | cb`) measured
  * back-to-back against the 2-column struct key — same pair mass,
  * half the key bytes through the one big exchange — and (b) a
  * stage-metrics listener so each phase reports memory/disk SPILL and
  * peak execution memory, turning "the residual is one-box spill"
  * from a narrative into numbers (the SpillProbe listener discipline:
  * ListenerBus is async, so counters snapshot around each phase after
  * a drain sleep).
  *
  * Run: `sbt "runMain graft.examples.G04StageProbe /tmp/sf1 [phase…]"`
  * — extra args restrict to the named phases. ORDER BIAS IS REAL at
  * sf10: a phase that runs after another phase's 150 GB spill pays
  * the churned heap (the round-14 in-sweep-vs-fresh-JVM lesson, ~40%
  * on g04) — comparative numbers must come from one-phase-per-JVM
  * runs.
  */
object G04StageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val onlyPhases = args.drop(1).toSet
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    @volatile var peakExec = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          memSpill += m.memoryBytesSpilled
          diskSpill += m.diskBytesSpilled
          peakExec = math.max(peakExec, m.peakExecutionMemory)
        }
      }
    })

    def kept: DataFrame = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .join(spark.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck")), "ok")
      .select("ck", "pk")
      .repartition(col("pk"))
      .distinct()
      .withColumn("np", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("pk")))
      .filter(col("np") <= 40)
    val ds = col("ds")
    val comb = flatten(transform(ds, (a, i) =>
      transform(slice(ds, i + lit(2), size(ds)),
        b => struct(a.as("ca"), b.as("cb")))))
    def exploded: DataFrame = kept
      .groupBy("pk").agg(sort_array(collect_list("ck")).as("ds"))
      .select(explode(comb).as("p"))
      .select(col("p.ca").as("ca"), col("p.cb").as("cb"))
    // the shipped shape: one long through the exchange, unpack after
    val combPacked = flatten(transform(ds, (a, i) =>
      transform(slice(ds, i + lit(2), size(ds)),
        b => shiftleft(a.cast("long"), 32).bitwiseOR(b.cast("long")))))
    def explodedPacked: DataFrame = kept
      .groupBy("pk").agg(sort_array(collect_list("ck")).as("ds"))
      .select(explode(combPacked).as("cc"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    println(f"${"phase"}%-16s ${"wall_s"}%8s ${"spillMB"}%9s ${"diskMB"}%8s ${"peakMB"}%8s")
    def time(label: String)(body: => Unit): Unit = {
      if (onlyPhases.nonEmpty && !onlyPhases.contains(label)) return
      Thread.sleep(1000) // drain the previous phase's late stage events
      val m0 = memSpill; val d0 = diskSpill; peakExec = 0L
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"$label%-16s $wall%8.2f ${(memSpill - m0) >> 20}%9d " +
        f"${(diskSpill - d0) >> 20}%8d ${peakExec >> 20}%8d")
    }

    time("s1_kept") { noop(kept) }
    time("s2_explode") { noop(exploded) }
    time("s3_agg_struct") {
      noop(exploded.groupBy("ca", "cb").agg(count(lit(1)).as("n_common")))
    }
    time("s2p_explode") { noop(explodedPacked) }
    time("s3p_agg_packed") {
      noop(explodedPacked.groupBy("cc").agg(count(lit(1)).as("n_common")))
    }
    time("s4_mass") {
      println("pairs=" + explodedPacked.count())
    }
    spark.stop()
  }
}
