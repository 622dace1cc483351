package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** The ×10 SOURCE-COUNT scale probe for d15 (round 10; the round-9
  * verdict asked for the axis after the audit was re-grouped by
  * source-set pattern): the sf0.1 documents staged as `copies` copies
  * with doc_id offset and source relabeled `<source>_c<i>` — so the
  * source catalog grows ×copies (20 → 200 at ×10) while per-source
  * corpus volume stays fixed, the merge-many-crawls shape d15 exists
  * for.
  *
  * What must stay bounded, and what cannot: d15's OUTPUT is the full
  * pairwise overlap matrix — C(S, 2) rows grows quadratically in the
  * source count by definition, so wall-clock α ≈ 2 on this axis would
  * still be output-driven, not a scale bug. The probe therefore
  * reports, alongside α, the structural censuses that the round-9
  * re-grouping bounds: distinct (source, shingle) postings (linear in
  * corpus), distinct source-set PATTERNS (≤ distinct shingles — the
  * surface the old per-shingle self-join exploded on), the pattern
  * expansion mass Σ C(|sig|, 2) (the audit's real pair work), and
  * time per output pair (must be flat or falling).
  *
  * Usage: `sbt "runMain graft.examples.SourceCountProbe [copies]"`
  * (default 10). */
object SourceCountProbe {
  private val Base = "/root/testdata/sf0.1"

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = stage(spark, copies)
    println(s"probe estate: $dir (sf0.1 documents x $copies source-relabeled copies)")

    val nb = census(spark, Base, "base")
    val ng = census(spark, dir, s"x$copies")

    def d15(d: String) = () => graft.SparkEntry.queries("d15_source_overlap")(spark, d)
    val (b1, b2) = cold2(d15(Base))
    val (g1, g2) = cold2(d15(dir))
    val (tb, tg) = (math.min(b1, b2), math.min(g1, g2))
    // output-matrix sizes from the MEASURED source catalogs (the census
    // already reads them), not a hard-coded 20
    val (pb, pg) = (pairs(nb), pairs(ng))
    val a = math.log(tg / tb) / math.log(copies.toDouble)
    println(f"d15 base=$tb%.2f s x$copies=$tg%.2f s (cold $g1%.2f) alpha=$a%.2f")
    println(f"d15 output pairs: base=$pb%,d x$copies=$pg%,d; " +
      f"us/pair: base=${1e6 * tb / pb}%.0f x$copies=${1e6 * tg / pg}%.0f " +
      f"(flat-or-falling = per-pair cost bounded; the matrix itself is the output)")
    spark.stop()
  }

  private def pairs(s: Long): Long = s * (s - 1) / 2

  /** The audit's structural surfaces, computed independently of d15's
    * own code path (plain split + 2-gram shingles): postings must grow
    * linearly with the corpus, patterns stay ≤ distinct shingles, and
    * the expansion mass is the exact pair work the pattern grouping
    * performs (vs df² per shingle for the rejected postings self-join,
    * printed for contrast). */
  private def census(s: SparkSession, d: String, tag: String): Long = {
    val sh = s.read.parquet(s"$d/documents.parquet")
      .select(col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("source"), explode(expr(
        """array_distinct(transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))))"""
          .stripMargin)).as("k"))
      .distinct()
    val pat = sh.groupBy("k").agg(count(lit(1)).as("df"))
    val postings = pat.agg(
      sum("df").as("postings"), count(lit(1)).as("shingles"),
      sum((col("df") * (col("df") - 1) / 2).cast("long")).as("selfjoin_mass")).collect()(0)
    val sigs = sh.groupBy("k").agg(sort_array(collect_set("source")).as("sig"))
      .groupBy("sig").agg(count(lit(1)).as("nk"))
      .agg(count(lit(1)).as("patterns"),
        sum(expr("CAST(size(sig) * (size(sig) - 1) / 2 AS BIGINT)")).as("expansion_mass"),
        max(size(col("sig"))).as("max_sig")).collect()(0)
    val nsrc = sh.select("source").distinct().count()
    println(f"[census] $tag%-5s sources=$nsrc%,4d postings=${postings.getLong(0)}%,10d " +
      f"shingles=${postings.getLong(1)}%,9d rejected-selfjoin mass=${postings.getLong(2)}%,12d | " +
      f"patterns=${sigs.getLong(0)}%,8d expansion mass=${sigs.getLong(1)}%,10d max|sig|=${sigs.getInt(2)}%4d")
    nsrc
  }

  /** `copies` copies of the documents table: doc_id offset, source
    * suffixed per copy — texts are IDENTICAL across copies, so every
    * shingle's source set fans out ×copies (the mirrored-crawl worst
    * case: maximum pattern width, overlap ≈ 1 across mirrors). */
  private def stage(s: SparkSession, copies: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_srccount").toString
    val base = s.read.parquet(s"$Base/documents.parquet")
    (0 until copies).map { i =>
      if (i == 0) base
      else base
        .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("source", concat(col("source"), lit(s"_c$i")))
    }.reduce(_ unionByName _)
      .coalesce(8).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def cold2(mk: () => DataFrame): (Double, Double) = {
    def once(): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (once(), once())
  }
}
