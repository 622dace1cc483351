package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.{Engine, SparkEntry}

/** The MEMORY/SPILL axis (round-11 verdict ask): every growth probe so
  * far measured wall time on a roomy heap; none proved bounded memory.
  * This runs the heaviest declared queries under a deliberately
  * STARVED unified-memory pool and censuses the listener's spill
  * metrics — the question is not "is it fast" but "does every operator
  * DEGRADE to disk instead of OOMing" (sort/merge/agg paths that spill
  * are cluster-safe: an executor with 100× the data per task slows
  * down; one that buffers in heap falls over).
  *
  * Run: `SPARK_DRIVER_MEM=2g sbt "runMain graft.examples.SpillProbe \
  *   /root/testdata/sf0.1 0.1"` — 2 GiB heap × fraction 0.1 ≈ 170 MiB
  * of execution+storage for 32 task slots (~5 MiB per task before a
  * spill is forced — roughly modeling a 100× data-per-task overload
  * vs the default 8g × 0.6 pool).
  *
  * Listener caveat (the AsOfProbe lesson): ListenerBus delivery is
  * async — counters are snapshotted around each query after a drain
  * sleep, so a straggler stage charges at most the NEXT query's row,
  * never doubles.
  */
object SpillProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val fraction = args.lift(1).getOrElse("0.1")
    val cpus = Engine.defaultParallelism
    val spark = Engine.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.memory.fraction", fraction)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"heap=${Runtime.getRuntime.maxMemory() / (1 << 20)}MiB " +
      s"memory.fraction=$fraction cores=$cpus sf=$sfDir")

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

    // the top of the bench cost table + the operator families whose
    // memory story differs: window sorts, LSH band joins, iterative
    // graph loops, collect_list aggregation, the native as-of merge
    val targets = Seq(
      "p04_decontaminate", "d18_banding_curve", "d02_minhash_lsh_pairs",
      "g06_personalized_pagerank", "g04_copurchase_jaccard", "g01_pagerank",
      "d08_simhash_hamming", "d13_containment", "d19_substring_scrub",
      "w03_cumulative", "a13_corr_matrix", "q24_sessionize",
      "j12_asof_native", "q49_typed_topk", "t06_tfidf_top_terms",
      // round-12 heavies: the ensemble pair join, the composed
      // curation dataflow, the covariance aggregate + 1-row iteration
      "d20_dedup_ensemble", "p16_corpus_build_v3", "v25_pca_power")
      .filter(SparkEntry.queries.contains)

    println(f"${"query"}%-28s ${"wall_s"}%8s ${"spillMB"}%9s ${"diskMB"}%8s ${"peakMB"}%8s  status")
    targets.foreach { name =>
      Thread.sleep(1000) // drain the previous query's late stage events
      val m0 = memSpill; val d0 = diskSpill; peakExec = 0L
      val t0 = System.nanoTime()
      val status =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          "ok"
        } catch {
          case e: Throwable =>
            val root = Option(e.getCause).getOrElse(e)
            s"FAIL ${root.getClass.getSimpleName}"
        }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // drain this query's stage events
      println(f"$name%-28s $wall%8.2f ${(memSpill - m0) / 1e6}%9.1f " +
        f"${(diskSpill - d0) / 1e6}%8.1f ${peakExec / 1e6}%8.1f  $status")
      System.gc()
    }
    spark.stop()
  }
}
