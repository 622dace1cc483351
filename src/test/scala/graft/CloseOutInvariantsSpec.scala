package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-6 close-out additions (d14, p14,
  * v21, j11, x10, x11) — each query's defining property checked
  * independently of the DuckDB oracle, on sf0.001, including the
  * CROSS-query consistency the oracles can't see (d14 vs d06, p14 vs
  * d14, j11 vs q23). */
class CloseOutInvariantsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String) = SparkEntry.queries(name)(spark, sf).collect()

  test("d14: one keeper per d06 component, keeper is a member, chars non-negative") {
    val d06 = rows("d06_dup_components").map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d14 = rows("d14_cluster_retention")
    assert(d14.map(_.getLong(0)).toSet == d06.keySet,
      "retention must cover exactly the d06 components")
    d14.foreach { r =>
      val (comp, keeper, nDocs, dropped) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDocs == d06(comp), s"component $comp size mismatch")
      assert(keeper >= comp, s"keeper $keeper below component min-label $comp")
      assert(dropped >= 0, s"component $comp dropped_chars negative")
    }
  }

  test("p14: drop census sums to the d14 cluster drops; fractions consistent") {
    val d14 = rows("d14_cluster_retention")
    val totalDropped = d14.map(r => r.getLong(2) - 1).sum // members minus keeper
    val p14 = rows("p14_retention_yield")
    assert(p14.map(_.getLong(3)).sum == totalDropped,
      "per-source drops must sum to per-cluster drops")
    val docs = Tables.documents(spark, sf).count()
    assert(p14.map(_.getLong(1)).sum == docs, "source totals must cover the corpus")
    p14.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3), "members bound drops")
      val expect = 1.0 - r.getLong(3).toDouble / r.getLong(1)
      assert(math.abs(r.getDouble(4) - expect) < 1e-3, s"pct_kept off for ${r.getString(0)}")
    }
  }

  test("v21: only admitted labels, scores within [-1,1] descending, k rows") {
    val r = rows("v21_filtered_ann")
    assert(r.length == 10)
    assert(r.forall(x => Set(1, 3).contains(x.getInt(1))), "label filter leaked")
    val scores = r.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse, "not score-descending")
    assert(scores.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("j11: a subset of q23 matches — tolerance only nulls, never rewrites") {
    val q23 = rows("q23_asof_join")
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    val j11 = rows("j11_asof_tolerance")
    assert(j11.length == q23.size, "tolerance must not drop purchases")
    j11.foreach { r =>
      val pid = r.getLong(0)
      val (v23, g23) = q23(pid)
      (Option(r.get(1)), Option(r.get(2))) match {
        case (Some(v), Some(g)) =>
          assert(Some(v) == v23 && Some(g) == g23, s"purchase $pid rewrote its match")
          assert(g.asInstanceOf[Long] <= 600, s"purchase $pid match over tolerance")
        case (None, None) =>
          // nulled: either q23 had no match at all, or it was too stale
          assert(g23.forall(_.asInstanceOf[Long] > 600), s"purchase $pid nulled in-window match")
        case other => fail(s"purchase $pid half-null: $other")
      }
    }
  }

  test("x10: merged read covers all orders; only batch-2 rows carry status") {
    val r = rows("x10_schema_evolution")
    val orders = Tables.orders(spark, sf)
    assert(r.map(_.getLong(1)).sum == orders.count(), "merged read dropped rows")
    val pre = r.filter(_.getString(0) == "<pre-evolution>")
    assert(pre.length == 1 && pre.head.getLong(1) ==
      orders.filter(org.apache.spark.sql.functions.col("o_orderkey") % 2 === 0).count(),
      "pre-evolution bucket must be exactly the batch-1 rows")
  }

  test("x11: corrupt + valid = lines, and the corruption rule is the census") {
    val r = rows("x11_corrupt_records").head
    val (lines, corrupt, valid) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(corrupt + valid == lines, "quarantine must be lossless")
    val events = Tables.events(spark, sf)
    assert(lines == events.count(), "one line per event")
    assert(corrupt == events.filter(
      org.apache.spark.sql.functions.col("event_id") % 10 === 0).count())
  }
}
