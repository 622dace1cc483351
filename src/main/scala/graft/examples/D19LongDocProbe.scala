package graft.examples

import org.apache.spark.sql.functions._

/** d19's long-document growth axis (round-11 verdict item 3): the span
  * surgery materializes per-row `sequence(1, n_tokens)` + covered-union
  * arrays — linear in document length, but a BOOK-length doc (10⁵–10⁶
  * tokens) makes each row's arrays megabytes. Does the per-doc cost
  * stay linear, or does a per-row array cliff appear?
  *
  * Synthesizes a corpus of 8 docs of L tokens each (shared 64-token
  * blocks planted at intervals so every doc carries real redundant
  * spans — ~25% of each doc is scrubbable), writes it as a documents
  * table under /tmp, and times the UNCHANGED d19 query
  * (`SparkEntry.queries("d19_substring_scrub")`) over it at
  * L ∈ {10³, 10⁴, 10⁵, 10⁶}. Linear = wall grows ~10× per step; a
  * cliff (≫10× or OOM) would call for segment-local surgery (process
  * spans per 10⁴-token segment, stitch). Executor-memory bound to
  * note: each TASK holds the arrays of the docs in its partition —
  * at L = 10⁶ that is ~3 int arrays × 4 MB + the token array per row;
  * one book per row is fine, a partition of thousands of books wants
  * `maxPartitionBytes` sized accordingly (the probe's 8-doc corpus
  * exercises the per-row bound, which is the cliff candidate).
  *
  * Usage: runMain graft.examples.D19LongDocProbe [maxExp]
  */
object D19LongDocProbe {
  def main(args: Array[String]): Unit = {
    val maxExp = args.headOption.map(_.toInt).getOrElse(6)
    val spark = graft.Engine.session()
    println(f"${"L_tokens"}%9s ${"wall_s"}%7s ${"rows"}%5s ${"removed_tot"}%12s")
    for (exp <- 3 to maxExp) {
      val L = math.pow(10, exp).toLong
      val dir = s"/tmp/d19long_${ProcessHandle.current().pid()}/L$exp"
      // 8 docs × L tokens: token i of doc d is w<d>x<i> — globally
      // unique BY CONSTRUCTION (a modular mix here collides in
      // arithmetic RUNS once 8·L exceeds the modulus, silently turning
      // filler into scrubbable spans) — except every 256-token stripe
      // opens with a 64-token SHARED block (same words across docs AND
      // stripes) → redundant 8-gram spans ≈ 25% of each doc + the
      // 7-token gram extension, the d19 workload shape
      spark.range(8).select(
          col("id").as("doc_id"),
          array_join(
            transform(sequence(lit(1L), lit(L)), i =>
              when(i % 256 < 64, concat(lit("s"), (i % 256).cast("string")))
                .otherwise(concat(
                  lit("w"), col("id").cast("string"), lit("x"),
                  i.cast("string")))),
            " ").as("text"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val res = graft.SparkEntry.queries("d19_substring_scrub")(spark, dir)
        .agg(count(lit(1)).as("rows"), sum("n_removed").as("rm"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"${L}%9d $wall%7.2f ${res.getLong(0)}%5d ${res.getLong(1)}%12d")
    }
    spark.stop()
  }
}
