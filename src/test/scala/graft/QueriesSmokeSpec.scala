package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFns._

/** Smoke: every declared query runs at sf0.001 (the driver's t1 gate),
  * the flagship entry() returns rows, and the approximate vector paths
  * are consistent with the exact baseline. */
class QueriesSmokeSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("no oracle is null (object-init-order trap: vals declared below defs)") {
    // ot22/ov24/od15 all hit this once: a plain val referenced by the
    // defs list before its declaration point initializes to null and
    // only explodes in the driver's Verify JSON dump
    val nulls = SparkEntry.oracleSql.collect { case (k, null) => k }
    assert(nulls.isEmpty, s"null oracle SQL for: ${nulls.mkString(", ")}")
  }

  test("every oracle key has a query and vice versa (driver contract)") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs))
    assert(qs == os, "every declared query carries an oracle")
  }

  test("SRP-bucketed ANN scores agree with the exact brute-force ranking") {
    // Exact all-corpus cosine scores vs the vec_id=0 query.
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val q = e.filter(col("vec_id") === 0).select(col("e").as("qe"))
    val exact = e.crossJoin(broadcast(q))
      .select(col("vec_id"), (dot(col("e"), col("qe")) / (norm(col("e")) * norm(col("qe")))).as("cs"))
      .collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .toMap
    val ann = SparkEntry.queries("v02_srp_ann")(spark, sf).collect()
    assert(ann.nonEmpty)
    // The query vector itself is always in its own bucket with score 1.
    assert(ann.exists(r => r.getLong(0) == 0L && r.getDouble(1) == 1.0))
    // Every ANN hit is a real corpus vector with the exact cosine score —
    // the approximation restricts the CANDIDATE SET, never the scores.
    // v02 rounds in product space; the recomputation here rounds via
    // BigDecimal — allow one ulp of the 4th decimal for midpoint ties.
    ann.foreach { r =>
      val got = r.getDouble(1)
      val want = exact(r.getLong(0))
      assert(math.abs(got - want) <= 1.01e-4, s"vec ${r.getLong(0)}: $got vs $want")
    }
  }

  test("multi-probe ANN recall dominates single-bucket ANN") {
    val single = SparkEntry.queries("v02_srp_ann")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val multi = SparkEntry.queries("v05_srp_multiprobe")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the probed candidate set strictly contains the single bucket, so the
    // top-k can only improve: every single-bucket hit at or above the
    // multiprobe cutoff must still be present, with the same score
    val cutoff = multi.values.min
    single.filter(_._2 >= cutoff).foreach { case (id, score) =>
      assert(multi.contains(id) && multi(id) == score,
        s"vec $id ($score) lost by multiprobe")
    }
    assert(multi.size >= single.size || multi.size == 10)
  }

  test("IVF probe returns vectors from at most nprobe=2 coarse partitions") {
    val ann = SparkEntry.queries("v03_ivf_centroid")(spark, sf).collect().map(_.getLong(0))
    val labels = Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(ann.toIndexedSeq: _*))
      .select("label").distinct().collect()
    assert(labels.length <= 2, "IVF re-rank stays within the probed partitions")
  }
}
