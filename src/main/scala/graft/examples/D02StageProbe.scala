package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Engine
import graft.queries.DedupQueries

/** Stage/shape breakdown for d02's sf100 super-linearity (round-15
  * third-decade probe: α 1.44/decade, 18.0 → 501.7 s cold — the one
  * plan that died at the third decade while p04/p06/m03 stayed
  * linear). Three suspects, each isolated per the round-15 verdict:
  *
  *  1. SHUFFLE WIDTH — `Engine` pins shuffle partitions to the core
  *     count (32); at sf100 each of 32 partitions carries ×1000 the
  *     sf0.1 band rows and the external sort goes multi-pass. Probed
  *     by running the SAME phase under `SPARK_GRAFT_SHUFFLE_PARTITIONS`
  *     (the env already exists) — width is a session property, so the
  *     A/B is two fresh-JVM invocations of one phase, not a flag here.
  *  2. CARRY vs JOIN-BACK — [[DedupQueries.lshVerifiedPairs]]'s
  *     automatic switch reads ONLY bytes/doc (an estate property that
  *     never moves with SF), so the estate's ~2.6 KB payloads pick
  *     carry at every scale; carrying 5M shingle arrays ×4 bands
  *     through a collect_list aggregation is exactly the shape that
  *     wins at sf0.1 and dies at sf100. `carry` / `jb` phases pin the
  *     shape via `forceShape`.
  *  3. CAP/BUCKET PRESSURE — the d08 lesson: a banding sized at small
  *     SFs can saturate its key space a decade later. `census` dumps
  *     the full (band, bh) bucket-size distribution (the capBlocks
  *     observe only reports max + dropped mass).
  *
  * Phases (`sig` isolates the signature build + localCheckpoint cost
  * that every shape pays):
  *   sig     — sigWithSh materialized (narrow proxy via d02BandsNarrow)
  *   carry   — full d02 tail, forceShape = carry
  *   jb      — full d02 tail, forceShape = join-back
  *   census  — bucket-size distribution + pair-mass integrals
  *
  * Run: `HEAP=96g tools/run_main.sh graft.examples.D02StageProbe
  *   /tmp/sf100 <phase…>` — ONE comparative phase per JVM (the
  * G04StageProbe order-bias lesson: after a big spill the next phase
  * pays the churned heap; fresh-JVM numbers or nothing). Spill/peak
  * columns via the stage-metrics listener (SpillProbe discipline:
  * ListenerBus is async — drain sleeps around each phase). */
object D02StageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf100")
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

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    println(s"sfDir=$d shufflePartitions=" +
      spark.conf.get("spark.sql.shuffle.partitions"))
    println(f"${"phase"}%-8s ${"wall_s"}%8s ${"spillMB"}%9s ${"diskMB"}%8s ${"peakMB"}%8s")
    def time(label: String)(body: => Unit): Unit = {
      if (onlyPhases.nonEmpty && !onlyPhases.contains(label)) return
      Thread.sleep(1000)
      val m0 = memSpill; val d0 = diskSpill; peakExec = 0L
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"$label%-8s $wall%8.2f ${(memSpill - m0) >> 20}%9d " +
        f"${(diskSpill - d0) >> 20}%8d ${peakExec >> 20}%8d")
    }

    def d02Tail(jb: Boolean): DataFrame =
      DedupQueries.lshVerifiedPairs(spark, d, forceShape = Some(jb))
        .select(col("da"), col("db"), round(col("jac"), 3).as("jaccard"))
        .distinct()

    time("sig") { noop(DedupQueries.d02BandsNarrow(spark, d)) }
    time("carry") { noop(d02Tail(jb = false)) }
    time("jb") { noop(d02Tail(jb = true)) }
    time("census") {
      val sizes = DedupQueries.d02BandsNarrow(spark, d)
        .groupBy("band", "bh").agg(count(lit(1)).as("bn"))
        .select(col("bn")).cache()
      val cap = DedupQueries.PairBlockCap
      val stats = sizes.agg(
        count(lit(1)).as("buckets"),
        sum(col("bn")).as("band_rows"),
        max(col("bn")).as("max_bn"),
        expr("approx_percentile(bn, array(0.5, 0.99, 0.999))").as("q"),
        sum(col("bn") * (col("bn") - 1) / 2).as("pair_mass_uncapped"),
        sum(when(col("bn") <= cap, col("bn") * (col("bn") - 1) / 2)
          .otherwise(0L)).as("pair_mass_kept"),
        sum(when(col("bn") > cap, 1L).otherwise(0L)).as("buckets_over_cap")
      ).head()
      println(s"buckets=${stats.getLong(0)} band_rows=${stats.getLong(1)} " +
        s"max_bn=${stats.getLong(2)} p50/p99/p999=${stats.getSeq[Any](3)} " +
        s"pair_mass_uncapped=${stats.get(4)} pair_mass_kept=${stats.get(5)} " +
        s"buckets_over_cap=${stats.getLong(6)}")
      sizes.unpersist()
    }
    println("switch=" + DedupQueries.switchDecision("d02_bucket_census"))
    spark.stop()
  }
}
