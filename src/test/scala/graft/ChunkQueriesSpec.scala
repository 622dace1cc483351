package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the corpus-packaging family (c01–c03) that the DuckDB
  * oracle does not express: the chunk-count closed form, packing
  * conservation (no token lost or double-binned), and run-to-run
  * determinism of the hash-keyed dedup. */
class ChunkQueriesSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("c01: n_chunks follows the stride closed form ceil(n_tokens/24)") {
    val got = SparkEntry.queries("c01_chunk_stats")(spark, sf)
      .select("doc_id", "n_chunks").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1) - 1) / 24 + 1).toLong).toMap
    got.foreach { case (id, n) =>
      assert(n == expected(id), s"doc $id: chunk count $n != closed form ${expected(id)}")
    }
    assert(got.nonEmpty)
  }

  test("c03: packing conserves tokens per language and bins are contiguous from 0") {
    val bins = SparkEntry.queries("c03_pack_sequences")(spark, sf).collect()
    val perLang = bins.groupBy(_.getString(0))
    val truth = Tables.documents(spark, sf)
      .groupBy("lang").agg(sum(size(split(col("text"), " "))).as("nt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, rows) =>
      assert(rows.map(_.getLong(3)).sum == truth(lang),
        s"$lang: binned tokens must equal corpus tokens (none lost, none double-binned)")
      // bin 0 always exists (the first doc starts at offset 0) and bins
      // strictly increase; a doc longer than 512 tokens may legitimately
      // SKIP bins (it spans them), so contiguity is not an invariant
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head == 0 && ids.distinct.length == ids.length,
        s"$lang: bins must start at 0 and not repeat, got ${ids.mkString(",")}")
    }
    assert(perLang.nonEmpty)
  }

  test("c02: chunk dedup is deterministic across runs") {
    def run() = SparkEntry.queries("c02_chunk_dedup")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(run() == run())
  }
}
