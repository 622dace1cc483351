package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.Num.oround
import graft.functions.TextFns

/** Corpus packaging — the operators that turn a cleaned document corpus
  * into model-ready input: fixed-window chunking with overlap (the RAG /
  * context-window splitter), chunk-level duplicate detection (boilerplate
  * chunks repeat across documents even when whole docs are unique), and
  * sequence packing into token-budget bins (the concat-in-order packing a
  * pretraining dataloader performs).
  *
  * Scale shape: chunking is a per-row generator (narrow, no shuffle until
  * the bounded aggregate); chunk-dedup is one map-side-combined shuffle on
  * the chunk hash (the same exact-dedup shape as q18, one level down the
  * document hierarchy); packing is a per-stratum running sum — one shuffle
  * on the stratum key, linear state. None of them carries the chunk TEXT
  * past the hash, so shuffle payloads stay scalar.
  */
object ChunkQueries {

  /** Chunk window of 32 tokens, stride 24 (8-token overlap) — overlap
    * preserves context at chunk boundaries, the standard RAG setting.
    * Tail chunks shorter than the window are kept (both engines' slice
    * clamps at the array end). One definition feeds c01 and c02 so the
    * stats and the dedup can never disagree on chunk identity. */
  private val W = 32
  private val S = 24

  /** md5 per chunk, in document order, from a materialized token array
    * (TextFns performance contract: lambdas read attributes, never
    * recompute the split). */
  private def chunkHashes(toks: org.apache.spark.sql.Column) =
    transform(
      sequence(lit(1), size(toks), lit(S)),
      s => md5(concat_ws(" ", slice(toks, s, lit(W))).cast("binary")))

  /** C1 — per-document chunking stats: how many chunks the doc splits
    * into and how many are distinct (a doc whose chunks collapse is
    * internally repetitive — the chunk-level twin of t08). */
  private def c01(s: SparkSession, d: String): DataFrame =
    graft.Tables.rebalance(s, documents(s, d))
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), chunkHashes(col("toks")).as("hs"))
      .select(
        col("doc_id"),
        size(col("hs")).cast("long").as("n_chunks"),
        size(array_distinct(col("hs"))).cast("long").as("n_distinct"))
      .orderBy("doc_id")
      .limit(100)

  /** C2 — cross-document chunk dedup: chunks appearing in more than one
    * document (within-doc repeats collapsed first, so n_docs counts
    * documents, not occurrences). The top shared chunks are the
    * boilerplate a corpus cleaner strips even when no two whole docs are
    * equal. One explode + one hash-keyed shuffle carrying (hash) only. */
  // rebalance (here and c01): the single-file corpus would otherwise run
  // the per-chunk md5 stream — the family's expensive stage — on one core
  private def c02(s: SparkSession, d: String): DataFrame =
    graft.Tables.rebalance(s, documents(s, d))
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(array_distinct(chunkHashes(col("toks")))).as("h"))
      .groupBy("h")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .orderBy(col("n_docs").desc, col("h"))
      .limit(20)

  /** C3 — sequence packing audit: documents concatenated in doc_id order
    * per language, assigned to 512-token bins by their starting offset
    * (bin = prior tokens ÷ 512) — the deterministic first-fit-in-order
    * packing a pretraining dataloader uses, with per-bin fill factor as
    * the audit output. The running sum is per-stratum (lang), so at scale
    * each stratum packs independently after ONE shuffle on the stratum
    * key; there is no global order dependency across strata. */
  private def c03(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(s, d)
      .select(col("doc_id"), col("lang"), size(TextFns.tokens(col("text"))).as("nt"))
      .select(
        col("lang"), col("nt"),
        floor((sum("nt").over(w) - col("nt")) / 512).as("bin"))
      .groupBy("lang", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("nt").cast("long").as("n_tokens"),
        oround(sum("nt").cast("double") / 512, 3).as("fill"))
      .orderBy("lang", "bin")
  }

  // ------------------------------------------------------------------
  // DuckDB oracles (prototyped in tools/proto_round5.py)
  // ------------------------------------------------------------------

  private val oc01 =
    """WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
      |c AS (SELECT doc_id, list_transform(generate_series(1, len(toks), 24),
      |        s -> md5(array_to_string(toks[s:s+31], ' '))) hs
      |      FROM t)
      |SELECT doc_id, len(hs) AS n_chunks, len(list_distinct(hs)) AS n_distinct
      |FROM c ORDER BY doc_id LIMIT 100""".stripMargin

  private val oc02 =
    """WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
      |c AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(toks), 24),
      |        s -> md5(array_to_string(toks[s:s+31], ' '))))) h
      |      FROM t)
      |SELECT h, count(*) AS n_docs FROM c GROUP BY h HAVING count(*) > 1
      |ORDER BY n_docs DESC, h LIMIT 20""".stripMargin

  private val oc03 =
    """WITH t AS (SELECT doc_id, lang, len(string_split(text,' ')) nt FROM documents),
      |b AS (SELECT lang, nt,
      |        (sum(nt) OVER (PARTITION BY lang ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt) // 512 AS bin
      |      FROM t)
      |SELECT lang, bin::BIGINT AS bin, count(*) AS n_docs, sum(nt)::BIGINT AS n_tokens,
      |  ROUND(sum(nt)::DOUBLE / 512, 3) AS fill
      |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("c01_chunk_stats", c01, Some(oc01)),
    QueryDef("c02_chunk_dedup", c02, Some(oc02)),
    QueryDef("c03_pack_sequences", c03, Some(oc03)))
}
