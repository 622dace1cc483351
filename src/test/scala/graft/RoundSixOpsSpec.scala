package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-6 additions (a09–a11, w09/w10,
  * p11/p12, u05, d13, g04, t18, v19/v20, x07) — each query's defining
  * property checked independently of the DuckDB oracle, on sf0.001. */
class RoundSixOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("a09: staleness is non-negative and per-type counts sum to the table") {
    val rows = SparkEntry.queries("a09_freshness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("staleness_sec")) >= 0.0)
      assert(r.getDouble(r.fieldIndex("p50_gap_sec")) > 0.0)
    }
    val total = rows.map(_.getLong(rows.head.fieldIndex("n_events"))).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("a10: the funnel is monotone and rates stay in [0,1]") {
    val r = SparkEntry.queries("a10_funnel")(spark, sf).collect().head
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p && p > 0, s"funnel not monotone: $v/$c/$p")
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
    assert(r.getDouble(5) > 0, "median view->purchase latency must be positive")
  }

  test("a11: offset-0 cohort rows account for every user exactly once") {
    val rows = SparkEntry.queries("a11_retention")(spark, sf).collect()
    assert(rows.forall { r =>
      val off = r.getLong(r.fieldIndex("day_offset")); off >= 0 && off <= 7
    })
    // every user is active on their own first day, so the offset-0 rows
    // partition the user set by cohort
    val day0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(day0 == users, s"offset-0 total $day0 != $users users")
  }

  test("w10: exactly one peak row per event type") {
    val rows = SparkEntry.queries("w10_cusum_changepoint")(spark, sf).collect()
    val types = Tables.events(spark, sf)
      .select("event_type").distinct().count()
    assert(rows.length == types)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }

  test("p11: bins are 1..5 and per-source doc counts are conserved") {
    val rows = SparkEntry.queries("p11_curriculum_bins")(spark, sf).collect()
    assert(rows.forall { r => val b = r.getLong(1); b >= 1 && b <= 5 })
    val perSource = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val truth = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, n) => assert(truth(src) == n, src) }
    // within a source, min_score must be non-decreasing across bins
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byBin = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byBin.zip(byBin.tail).forall { case (a, b) => a <= b })
    }
  }

  test("p12: weights normalize to 1 and every source gets >= 1 epoch") {
    val rows = SparkEntry.queries("p12_epoch_plan")(spark, sf).collect()
    val wsum = rows.map(_.getDouble(rows.head.fieldIndex("weight"))).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    assert(rows.forall(_.getLong(rows.head.fieldIndex("n_epochs")) >= 1L))
  }

  test("u05: compaction groups conserve bytes and are contiguously numbered") {
    val rows = SparkEntry.queries("u05_compaction_plan")(spark, sf).collect()
    val perSource = rows.groupBy(_.getString(0))
    val truth = Tables.documents(spark, sf)
      .groupBy("source").agg(sum("n_chars").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, rs) =>
      assert(rs.map(_.getLong(rs.head.fieldIndex("group_chars"))).sum == truth(src))
      val groups = rs.map(_.getLong(1)).sorted
      assert(groups.head == 0L && groups.zipWithIndex.forall { case (g, i) => g == i },
        s"$src groups not contiguous: ${groups.mkString(",")}")
    }
  }

  test("d13: containment is a valid ratio and pairs are canonically ordered") {
    val rows = SparkEntry.queries("d13_containment")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "da < db")
      val c = r.getDouble(r.fieldIndex("containment"))
      assert(c > 0.0 && c <= 1.0, s"containment $c out of range")
      assert(r.getLong(r.fieldIndex("ni")) >= 1L)
    }
    // descending order by construction
    val cs = rows.map(_.getDouble(rows.head.fieldIndex("containment")))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }

  test("g04: jaccard is a valid ratio over canonically ordered customer pairs") {
    val rows = SparkEntry.queries("g04_copurchase_jaccard")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(r.fieldIndex("jaccard"))
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("t18: the Zipf slope is negative and the fit quality is a valid R^2") {
    val r = SparkEntry.queries("t18_zipf_fit")(spark, sf).collect().head
    assert(r.getLong(0) >= 2, "need at least two ranked tokens")
    assert(r.getDouble(1) <= 0.0, "frequency cannot increase with rank")
    val r2 = r.getDouble(2)
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("v19: quantized scores respect the per-dimension error bound") {
    import graft.functions.VectorFns.{dot, toDouble}
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val q = e.filter(col("vec_id") === 0).select(col("e").as("qe"))
    val exact = e.crossJoin(broadcast(q))
      .select(col("vec_id"), dot(col("e"), col("qe")).as("ds"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val maxAbs = e.select(max(array_max(transform(col("e"), x => abs(x)))))
      .collect().head.getDouble(0)
    // per-dim quantization error <= step/2 = s_d/254 <= maxAbs/254
    val dim = 64
    val bound = dim * (maxAbs / 254.0) * (2 * maxAbs + maxAbs / 254.0) + 1e-4
    val rows = SparkEntry.queries("v19_int8_search")(spark, sf).collect()
    rows.foreach { r =>
      val err = math.abs(r.getDouble(1) - exact(r.getLong(0)))
      assert(err <= bound, s"vec ${r.getLong(0)}: err $err > bound $bound")
    }
    val rec = rows.head.getDouble(rows.head.fieldIndex("recall10"))
    assert(rec >= 0.0 && rec <= 1.0)
  }

  test("v20: reranked scores ARE the exact cosines (candidates only restrict the set)") {
    import graft.functions.VectorFns.{dot, norm, toDouble}
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val q = e.filter(col("vec_id") === 0).select(col("e").as("qe"))
    val exact = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dot(col("e"), col("qe")) / (norm(col("e")) * norm(col("qe")))).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = SparkEntry.queries("v20_binary_rerank")(spark, sf).collect()
    assert(rows.exists(r => r.getLong(0) == 0L && r.getDouble(1) == 1.0),
      "the query vector survives its own radius scan with cosine 1")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - exact(r.getLong(0))) <= 1.01e-4,
        s"vec ${r.getLong(0)} score is not the exact cosine")
    }
  }

  test("x07: the partitioned roundtrip matches the unpartitioned computation") {
    val part = SparkEntry.queries("x07_hive_partitions")(spark, sf).collect()
    val plain = Tables.documents(spark, sf)
      .filter(col("lang") === "en")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source").collect()
    assert(part.length == plain.length && part.nonEmpty)
    part.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2))
    }
  }
}
