package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** ×N growth probe for the round-12 batch additions (t25 BM25,
  * t26 DSIR, p17 shard manifests over documents; a15 hopping windows
  * over events) — the DocCountProbe axis applied to the
  * corpus-statistics queries: sf0.1 documents unioned as doc_id-offset
  * copies with IDENTICAL texts, so tf/tok rows grow ×N while the
  * VOCABULARY — and with it every structure the scale story leans on —
  * stays fixed: df's aggregate output, t25's 5-term query set (df
  * counts all scale ×N so the 6–10 ranking is unchanged), t26's
  * (c_all, c_t) feature table. Events are unioned as event_id-offset
  * copies at the SAME timestamps, so a15's pane count is fixed and
  * only per-pane mass grows — the partial-combine axis. Expected
  * α ≈ 1 (the scan and the map-side-combined aggregates are the only
  * ×N work; everything downstream is vocab-, pane- or top-k-bounded).
  * The vocab censuses printed alongside are the structural receipt:
  * identical base vs ×N.
  *
  * Usage: `sbt "runMain graft.examples.RetrievalProbe [copies]"`
  * (default 10). α = log(t_big/t_base)/log(copies).
  */
object RetrievalProbe {
  private val Base = "/root/testdata/sf0.1"

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = stage(spark, copies)
    println(s"probe estate: $dir (sf0.1 documents+events x $copies id-offset copies)")

    // structural censuses: the vocab-bounded tables must NOT grow
    def vocab(d: String): Long = spark.read.parquet(s"$d/documents.parquet")
      .select(explode(split(col("text"), " ")).as("term"))
      .agg(countDistinct("term")).collect()(0).getLong(0)
    val (vb, vg) = (vocab(Base), vocab(dir))
    println(f"vocab (t26 feature-table rows, t25 df rows): base=$vb%,d x$copies=$vg%,d")

    val rows = Seq(
      "t25_bm25" -> both(spark, dir, "t25_bm25"),
      "t26_dsir_weights" -> both(spark, dir, "t26_dsir_weights"),
      "p17_shard_manifest" -> both(spark, dir, "p17_shard_manifest"),
      "a15_hopping_window" -> both(spark, dir, "a15_hopping_window"),
      // the composed 4-stage curation dataflow: its α is gated by its
      // widest stage (the d19 gram aggregate + the dedup window)
      "p16_corpus_build_v3" -> both(spark, dir, "p16_corpus_build_v3"))
    println(f"${"query"}%-20s ${"base"}%8s ${"x" + copies}%8s ${"alpha"}%7s")
    rows.foreach { case (n, (t1, tN)) =>
      val a = math.log(tN / t1) / math.log(copies.toDouble)
      println(f"$n%-20s $t1%8.2f $tN%8.2f $a%7.2f")
    }
    spark.stop()
  }

  private def stage(s: SparkSession, copies: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_retrieval").toString
    // Offsets derived from max(id)+1 of the base table, not a fixed
    // constant: a hard-coded stride silently collides (breaking the
    // fixed-vocab / ×N-rows invariant the alpha computation relies on)
    // the day the base estate's ids outgrow it.
    def strideOf(table: String, idCol: String): Long =
      s.read.parquet(s"$Base/$table.parquet")
        .agg(max(col(idCol))).collect()(0).getLong(0) + 1L
    val docStride = strideOf("documents", "doc_id")
    (0 until copies).map(i =>
      s.read.parquet(s"$Base/documents.parquet")
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * docStride)))
      .reduce(_ unionByName _)
      .coalesce(8).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // same timestamps, offset event ids: pane/window count FIXED,
    // per-pane mass ×copies — a15's partial-combine claim on its axis
    val evStride = strideOf("events", "event_id")
    (0 until copies).map(i =>
      s.read.parquet(s"$Base/events.parquet")
        .withColumn("event_id", col("event_id") + lit(i.toLong * evStride)))
      .reduce(_ unionByName _)
      .coalesce(8).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def both(s: SparkSession, dir: String, name: String): (Double, Double) =
    (time(() => graft.SparkEntry.queries(name)(s, Base)),
      time(() => graft.SparkEntry.queries(name)(s, dir)))

  /** Bench's discipline: noop-format write, two runs, min. */
  private def time(mk: () => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }
}
