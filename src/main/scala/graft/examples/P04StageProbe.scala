package graft.examples

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** p04's cost axis (round-15 verdict task 6: "p04's standing 49.5 s
  * sf10 cost"). p04 is honest-linear (α 1.01) — the question is the
  * CONSTANT: tokenizing the full corpus is the floor every
  * decontamination pass pays, but the md5-per-8-gram on top of it is an
  * implementation token, not a semantic one — the gram hash never
  * reaches output (both engines count overlapping DOCS; the DuckDB
  * oracle md5s independently), so any injective-enough gram token with
  * the same equality relation is admissible. Candidates, cheapest
  * equality first:
  *
  *  - `md5(concat_ws(gram))` — shipped (round-6): 32-hex-char strings,
  *    collision-free in practice, but one DigestUtils pass per gram and
  *    string tokens all the way down (array_distinct on strings,
  *    string explode, string broadcast set).
  *  - raw `concat_ws(gram)` — exact (no hash at all): saves the md5
  *    pass; tokens stay strings of similar width.
  *  - `xxhash64(concat_ws(gram))` — one codegen'd 64-bit hash, LONG
  *    tokens downstream (long array_distinct, long explode, long
  *    broadcast set). Collision risk n²/2⁶⁵: ~1e-5 at sf10's ~10⁸
  *    distinct grams — and a collision only matters if it pairs a
  *    train gram with a bench gram.
  *  - `xxhash64(slice(toks, i, 8))` — hash the token-array slice
  *    directly, skipping concat entirely (XxHash64 hashes arrays
  *    natively). Same equality relation: token sequences are equal iff
  *    their joined strings are (tokens are space-split so contain no
  *    spaces).
  *
  * Each variant is measured as the g8-BUILD (tokenize → grams →
  * array_distinct → explode → count, the part the token choice touches)
  * and as the FULL p04 dataflow (bench broadcast + semi-join +
  * doc-distinct + lang agg). min-of-2, noop-write discipline.
  *
  * Usage: `sbt "runMain graft.examples.P04StageProbe [sfDir]"`.
  */
object P04StageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")

    val md5Tok: Column => Column =
      toks => transform(sequence(lit(1), size(toks) - 7),
        i => md5(concat_ws(" ", slice(toks, i, lit(8))).cast("binary")))
    val rawTok: Column => Column =
      toks => transform(sequence(lit(1), size(toks) - 7),
        i => concat_ws(" ", slice(toks, i, lit(8))))
    val xxStr: Column => Column =
      toks => transform(sequence(lit(1), size(toks) - 7),
        i => xxhash64(concat_ws(" ", slice(toks, i, lit(8)))))
    val xxSlice: Column => Column =
      toks => transform(sequence(lit(1), size(toks) - 7),
        i => xxhash64(slice(toks, i, lit(8))))

    // xx64_guard: the SAME xx64_slice token but wrapped in g8OfToks'
    // when(size>=8) CASE guard instead of this probe's pre-filter —
    // isolates the guard's fusion cost from the token choice (the
    // declared p04 measured 4× the probe's p04Of after the token swap;
    // p16's comment records a 10× Generate-fusion cliff for the guard).
    val xxGuard: Column => Column =
      toks => when(size(toks) >= 8,
        transform(sequence(lit(1), size(toks) - 7),
          i => xxhash64(slice(toks, i, lit(8)))))
        .otherwise(array().cast("array<bigint>"))

    val variants = Seq(
      "md5_string" -> md5Tok, "raw_concat" -> rawTok,
      "xx64_string" -> xxStr, "xx64_slice" -> xxSlice,
      "xx64_guard" -> xxGuard)

    println(f"${"variant"}%-18s ${"g8_build"}%9s ${"full_p04"}%9s")
    for ((name, tok) <- variants) {
      val tBuild = time { g8Of(spark, d, tok).select(explode(col("g8"))) }
      val tFull = time { p04Of(spark, d, tok) }
      println(f"$name%-18s $tBuild%9.2f $tFull%9.2f")
    }
    spark.stop()
  }

  private def g8Of(s: SparkSession, d: String, tok: Column => Column): DataFrame =
    graft.Tables.rebalance(s, graft.Tables.documents(s, d))
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 8) // guard BEFORE transform: no negative sequence bound
      .select(col("doc_id"), col("lang"),
        array_distinct(tok(col("toks"))).as("g8"))

  /** p04's shipped dataflow with the gram token swapped. */
  private def p04Of(s: SparkSession, d: String, tok: Column => Column): DataFrame = {
    val docs = graft.Tables.documents(s, d)
    def side(f: Column): DataFrame =
      graft.Tables.rebalance(s, docs.filter(f))
        .select(col("doc_id"), col("lang"),
          graft.functions.TextFns.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 8)
        .select(col("doc_id"), col("lang"),
          array_distinct(tok(col("toks"))).as("g8"))
    val benchHashes = side(pmod(col("doc_id"), lit(50)) === 0)
      .select(explode(col("g8")).as("h")).distinct()
    side(pmod(col("doc_id"), lit(50)) =!= 0)
      .select(col("doc_id"), col("lang"), explode(col("g8")).as("h"))
      .join(broadcast(benchHashes), Seq("h"), "left_semi")
      .select(col("doc_id"), col("lang")).distinct()
      .groupBy("lang").agg(count(lit(1)).as("n_contaminated"))
      .orderBy("lang")
  }

  private def time(mk: => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }
}
