package graft.examples

import org.apache.spark.sql.functions._

/** WHERE is the d02↔d07 crossover — at what carried-payload size does
  * the join-back shape start beating carry?
  *
  * The round-12 bench fixed the two ENDPOINTS (carry 1.6 s vs
  * join-back 3.4 s at the sf estate's ~2.6 KB payloads); this sweeps
  * the axis between and past them so
  * [[graft.queries.DedupQueries.CarryShBytesCutoff]] is a measured
  * constant, not a guess. Corpus: 3,000 docs of L tokens each, tokens
  * globally unique per doc (bucket sizes stay 2 — the probe isolates
  * PAYLOAD, not hot mass) except each even/odd doc pair shares ~90% of
  * its tokens (planted near-dups, so the verify stage does real work).
  * Payload/doc ≈ L × (avg bigram chars + 16 B element overhead). Both
  * shapes of the IDENTICAL capped pipeline
  * ([[graft.queries.DedupQueries.lshVerifiedPairs]] with forceShape)
  * run per L, Bench's min-of-2 noop-write discipline.
  *
  * Usage: runMain graft.examples.SwitchProbe [maxL]
  */
object SwitchProbe {
  def main(args: Array[String]): Unit = {
    val maxL = args.headOption.map(_.toInt).getOrElse(4096)
    val nDocs = 3000
    val spark = graft.Engine.session()

    println(f"${"L_tokens"}%9s ${"avg_sh_bytes"}%13s ${"carry_s"}%8s " +
      f"${"joinback_s"}%11s ${"winner"}%9s")
    var l = 64
    while (l <= maxL) {
      val dir = s"/tmp/switchprobe_${ProcessHandle.current().pid()}/L$l"
      // even doc 2k: tokens w<2k>x<i>; odd doc 2k+1: the same tokens
      // except every 20th is its own — pairwise bigram Jaccard ≈ 0.82
      // (each changed token corrupts 2 bigrams, so a 5% token change
      // is a ~10% shingle change — 1/10 was Jaccard 0.67, sub-threshold)
      spark.range(nDocs).select(
          col("id").as("doc_id"),
          array_join(
            transform(sequence(lit(1), lit(l)), i =>
              when(col("id") % 2 === 1 && i % 20 === 0,
                concat(lit("w"), col("id"), lit("x"), i))
                .otherwise(
                  concat(lit("w"), (col("id") - col("id") % 2), lit("x"), i))),
            " ").as("text"))
        .repartition(8)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      def run(joinBack: Boolean): Double = {
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.queries.DedupQueries
            .lshVerifiedPairs(spark, dir, forceShape = Some(joinBack))
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        math.min(once(), once())
      }
      val avgBytes = spark.read.parquet(s"$dir/documents.parquet")
        .select(graft.functions.TextFns.tokens(col("text")).as("toks"))
        .select(graft.functions.TextFns.shinglesOf(col("toks"), 2).as("sh"))
        .agg(avg(aggregate(col("sh"), lit(0L),
          (acc, x) => acc + length(x) + lit(16L))))
        .head().getDouble(0)
      val (tc, tj) = (run(false), run(true))
      println(f"$l%9d $avgBytes%13.0f $tc%8.2f $tj%11.2f " +
        f"${if (tc <= tj) "carry" else "JOIN-BACK"}%9s")
      l *= 4
    }
    spark.stop()
  }
}
