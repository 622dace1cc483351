package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup / text-analysis
  * operators.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order array functions — per-row, narrow (no shuffle, no UDF), so
  * each stays inside WholeStageCodegen and scales linearly with input.
  *
  * Hashes are md5-based because md5 is the one hash with identical output
  * in Spark and DuckDB (the correctness oracle) — xxhash64/hash are
  * engine-specific.
  */
object TextFns {

  /** Whitespace tokens. The corpus is single-space joined; `split` keeps
    * any trailing empty token, matching DuckDB `string_split`. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles; empty array when the doc has fewer
    * than n tokens (the reference drops short/invalid rows rather than
    * nulling them — `/root/reference/src/bluetooth/scanner.rs:36-45`; we
    * keep the same drop-not-null discipline). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(
      size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** One MinHash signature component: min over shingles of
    * md5(seed ":" shingle). Lexicographic min over lowercase-hex md5 is a
    * uniform minimum — and, unlike integer-folded hashes, is directly
    * reproducible in the oracle (`min(md5('0:'||s))`). */
  def minhashComponent(shingleArr: Column, seed: Int): Column =
    array_min(
      transform(shingleArr, s => md5(concat(lit(s"$seed:"), s).cast("binary"))))

  /** 60-bit token hash: the first 15 hex chars of md5, as a long. 15 hex
    * digits = 60 bits keeps the value positive in a signed 64-bit long in
    * both engines (`conv` here, `('0x'||…)::BIGINT` in DuckDB). */
  def hash60(tok: Column): Column =
    conv(substring(md5(tok.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Winnowing-style document fingerprint: the minimum md5 over the
    * document's word k-grams. Equal fingerprints ⇒ the two documents share
    * their lexicographically-smallest k-gram hash — a cheap, fully
    * distributive near-dup blocking key (k=5 default mirrors the k-gram
    * size used by MOSS-style winnowing). */
  def fingerprint(text: Column, k: Int = 5): Column = {
    val toks = tokens(text)
    when(
      size(toks) >= k,
      array_min(
        transform(
          sequence(lit(1), size(toks) - (k - 1)),
          i => md5(concat_ws(" ", slice(toks, i, lit(k))).cast("binary")))))
      .otherwise(md5(text.cast("binary"))) // short doc: whole-text hash
  }

  /** Jaccard similarity of two already-distinct string arrays. Union size
    * is |a|+|b|−|a∩b| (identical formula in the DuckDB oracle — avoids
    * relying on the two engines' union-dedup semantics agreeing). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }
}
