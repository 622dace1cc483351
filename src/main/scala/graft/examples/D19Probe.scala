package graft.examples

import org.apache.spark.sql.functions._

import graft.Engine
import graft.functions.TextFns

/** Stage-wise timing for d19 (exact-substring scrub) plus the gram
  * kernel shoot-out that found the CASE-around-lambda cliff. Measured
  * at sf0.1 (warm, local[32]):
  *
  *  - A `when(size>=k, transform…md5).otherwise([])` + posexplode: 2.9 s
  *  - C same without md5: 2.6 s — hashing is NOT the cost
  *  - D/E `filter(size>=k)` + (pos)explode of the bare transform: 0.3 s
  *  - F/G shinglesOf with its then-internal when vs the bare
  *    transform: 2.8 s vs 1.5 s on bigrams
  *  - B element_at-per-word concat instead of slice+concat_ws: 14.5 s
  *    (8 interpreted element_at calls per gram — never do this)
  *
  * A CASE wrapping a higher-order function forces the lambda out of
  * the Generate's fused evaluation — the 10× between A and D/E with
  * identical output. Consequences shipped: d19 filters instead of
  * guarding, and [[graft.functions.TextFns.shinglesOf]] moved its
  * guard to the caller contract (~2× on the whole d02/d04/d07/d13/
  * d15/d18 shingle family's staging pass). The d19 stage breakdown
  * (gram stage / agg+joinback / surgery) runs after the variants.
  *
  * HOT-TEMPLATE receipt (the adversarial mass that forces d02/d08 to
  * df-cap their buckets): +2,000 copies of one 60-token template —
  * every gram at df ≈ 2,000, +45% gram occurrences over sf0.1 —
  * moves d19 from 1.26 s to 1.58 s warm (+25%, sub-linear in added
  * rows). The count+argmin aggregate absorbs the hot mass with NO
  * cap needed: a df-2,000 gram is one partial per task, never
  * 2,000²/2 pairs (the reason d19, unlike the bucket-join dedups,
  * carries no PairBlockCap).
  *
  * Run: `sbt "runMain graft.examples.D19Probe [sfDir]"`. */
object D19Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val k = 8
    def tokenized = graft.Tables.rebalance(spark,
        spark.read.parquet(s"$d/documents.parquet"))
      .select(col("doc_id"), col("text"),
        split(col("text"), " ").as("toks"))

    def gramVariant(name: String)(gh: org.apache.spark.sql.Column): Unit =
      time(name) {
        tokenized.select(col("doc_id"),
            when(size(col("toks")) >= k, gh)
              .otherwise(array().cast("array<string>")).as("gh"))
          .select(col("doc_id"), posexplode(col("gh")).as(Seq("p0", "h")))
          .write.format("noop").mode("overwrite").save()
      }
    for (r <- 1 to 2) {
      // shinglesOf carries its own internal when(size >= n) guard even
      // when the caller already filtered — does the CASE cost the same
      // 10× there?
      time(s"F shinglesOf (internal when) #$r") {
        tokenized.filter(size(col("toks")) >= 2)
          .select(col("doc_id"), TextFns.shinglesOf(col("toks"), 2).as("sh"))
          .select(col("doc_id"), explode(col("sh")).as("s"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"G bare shingle transform #$r") {
        tokenized.filter(size(col("toks")) >= 2)
          .select(col("doc_id"), array_distinct(
            transform(sequence(lit(1), size(col("toks")) - 1),
              i => concat_ws(" ", slice(col("toks"), i, lit(2))))).as("sh"))
          .select(col("doc_id"), explode(col("sh")).as("s"))
          .write.format("noop").mode("overwrite").save()
      }
      gramVariant(s"A slice+concat_ws md5 #$r")(TextFns.kgramHashes(col("toks"), k))
      gramVariant(s"C slice+concat_ws no-md5 #$r")(
        transform(sequence(lit(1), size(col("toks")) - (k - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
      time(s"D t20 shape (filter+explode) #$r") {
        tokenized
          .filter(size(col("toks")) >= k)
          .select(col("doc_id"),
            explode(TextFns.kgramHashes(col("toks"), k)).as("h"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"E filter+posexplode #$r") {
        tokenized
          .filter(size(col("toks")) >= k)
          .select(col("doc_id"),
            posexplode(TextFns.kgramHashes(col("toks"), k)).as(Seq("p0", "h")))
          .write.format("noop").mode("overwrite").save()
      }
    }

    for (round <- 1 to 2) {
      println(s"-- round $round --")
      val g = time("gram stage (checkpoint)") {
        tokenized
          .filter(size(col("toks")) >= k)
          .select(col("doc_id"),
            posexplode(TextFns.kgramHashes(col("toks"), k)).as(Seq("p0", "h")))
          .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
          .localCheckpoint()
      }
      val stats = g.groupBy("h").agg(
        count(lit(1)).as("nh"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      val rstarts = g.join(stats, "h")
        .filter(col("nh") >= 2 &&
          !(col("doc_id") === col("first.doc_id") &&
            col("pos") === col("first.pos")))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("pos"))).as("rst"))
      val rs = time("agg+joinback (checkpoint)")(rstarts.localCheckpoint())
      val nCol = size(col("toks"))
      val cov = array_sort(array_distinct(flatten(
        transform(col("rst"), i => sequence(i, least(i + (k - 1), nCol))))))
      time("surgery + write") {
        tokenized.select(col("doc_id"), col("toks"))
          .join(rs, Seq("doc_id"))
          .select(col("doc_id"), col("toks"), cov.as("cov"))
          .select(
            col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            size(col("cov")).cast("long").as("n_removed"),
            size(filter(col("cov"), (x, i) =>
              when(i === 0, lit(true))
                .otherwise(x =!= element_at(col("cov"), i) + 1)))
              .cast("long").as("n_spans"),
            md5(array_join(
              transform(
                array_except(sequence(lit(1), size(col("toks"))), col("cov")),
                p => element_at(col("toks"), p)), " ").cast("binary"))
              .as("clean_hash"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }

    // HOT-TEMPLATE axis: d19's scale claim is "no pair enumeration
    // anywhere — a gram occurring N times costs a count, never N²
    // pairs". Stage an adversarial corpus: the sf corpus PLUS 2,000
    // copies of one 60-token template (every gram in it reaches
    // df ≈ 2,000 — the mass that forces d02/d08 to df-cap their
    // buckets), and time the DECLARED d19 on both. Linear-in-rows is
    // the pass: the hot mass adds ~120k gram occurrences (~45% of
    // sf0.1's 263k), so wall should grow by roughly that fraction —
    // quadratic behavior would add minutes.
    val hotDir = java.nio.file.Files.createTempDirectory("d19hot").toString
    val template = (1 to 60).map(i => s"hot$i").mkString(" ")
    spark.read.parquet(s"$d/documents.parquet")
      .unionByName(
        spark.range(2000).selectExpr(
          "id + 10000000 AS doc_id", s"'$template' AS text",
          "'en' AS lang", "'hot' AS source",
          s"${template.length} AS n_chars"),
        allowMissingColumns = true)
      .write.mode("overwrite").parquet(s"$hotDir/documents.parquet")
    val d19 = graft.SparkEntry.queries("d19_substring_scrub")
    def runD19(name: String, dir: String): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        d19(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      time(name)(once())
    }
    runD19("d19 base corpus", d)
    runD19("d19 + 2000-copy template", hotDir)

    // The same axis for q54 (streaming near-dup). HISTORY: the
    // single-tier v1 (every doc through the uncapped band join)
    // measured 7.5 s base → 377 s with the template mass — the
    // |copies|²-per-band quadratic this probe exists to catch. The
    // shipped TWO-TIER design (exact-hash classes collapse to their
    // representative before the LSH tier; copies inherit the rep's
    // verdict — see q54's scaladoc for the exactness proof) measures
    // 12.1 s base → 8.6 s hot: template mass now costs a hash lookup
    // per copy, and the all-template batch is the CHEAPEST batch.
    val q54 = graft.SparkEntry.queries("q54_stream_neardup")
    def runQ54(name: String, dir: String): Unit = time(name) {
      q54(spark, dir).write.format("noop").mode("overwrite").save()
    }
    runQ54("q54 base corpus (cold)", d)
    runQ54("q54 + 2000-copy template (cold)", hotDir)
    spark.stop()
  }
}
