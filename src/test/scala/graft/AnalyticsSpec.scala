package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the analytics family: each rewrite-style query
  * (salted agg, banded range join, sketch audits, hash split) is proven
  * equivalent to its naive/exact counterpart on sf0.001. */
class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("s01: salted two-phase aggregation ≡ plain aggregation") {
    import graft.functions.Num.oround
    val salted = SparkEntry.queries("s01_salted_agg")(spark, sf).collect()
    // the same projection s01 applies (oround included), unsalted — so
    // every output column compares exactly, not within a tolerance
    val plain = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(sum("value").as("s"), count("value").as("n"),
        min("value").as("mn"), max("value").as("mx"))
      .select(col("event_type"), oround(col("s"), 2).as("sum_value"),
        col("n"), oround(col("mn"), 2).as("min_value"), oround(col("mx"), 2).as("max_value"))
      .orderBy("event_type")
      .collect()
    assert(salted.length == plain.length && salted.nonEmpty)
    salted.zip(plain).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getDouble(1) == b.getDouble(1), "sum")
      assert(a.getLong(2) == b.getLong(2), "count")
      assert(a.getDouble(3) == b.getDouble(3), "min")
      assert(a.getDouble(4) == b.getDouble(4), "max")
    }
  }

  test("j02: banded range join ≡ naive O(n²) range join") {
    val banded = SparkEntry.queries("j02_banded_range_join")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("sec"))
    val naive = e.toDF("ua", "ida", "tsa", "seca")
      .join(e.toDF("ub", "idb", "tsb", "secb"),
        col("ua") === col("ub") &&
          (col("tsb") > col("tsa") ||
            (col("tsb") === col("tsa") && col("idb") > col("ida"))) &&
          col("secb") - col("seca") <= 300 && col("secb") - col("seca") >= 0)
      .groupBy("ua").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(banded == naive, s"banded=$banded naive=$naive")
    assert(banded.nonEmpty)
  }

  test("a01/a02: sketch audits hold their error budget") {
    val hll = SparkEntry.queries("a01_hll_audit")(spark, sf).collect()
    assert(hll.nonEmpty && hll.forall(_.getBoolean(2)), "HLL within 10%")
    val qa = SparkEntry.queries("a02_quantile_audit")(spark, sf).collect()
    assert(qa.nonEmpty && qa.forall(_.getBoolean(2)), "approx_percentile within tolerance")
  }

  test("p01: split is exhaustive, deterministic, and roughly 80/10/10") {
    val rows = SparkEntry.queries("p01_train_split")(spark, sf).collect()
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum
    assert(total == Tables.documents(spark, sf).count())
    val trainFrac = bySplit.getOrElse("train", 0L).toDouble / total
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train fraction $trainFrac")
    // deterministic: a second run is bit-identical
    val again = SparkEntry.queries("p01_train_split")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("a06: column profile agrees with directly-computed facts") {
    val prof = SparkEntry.queries("a06_column_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size == 6)
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val idRow = prof("event_id")
    assert(idRow.getDouble(1) == 0.0, "event_id has no nulls")
    assert(idRow.getLong(2) == n, "event_id is unique")
    assert(idRow.getString(4) == ev.agg(min("event_id")).head().getLong(0).toString)
    assert(idRow.getString(5) == ev.agg(max("event_id")).head().getLong(0).toString)
    val etRow = prof("event_type")
    assert(etRow.getLong(2) == ev.select("event_type").distinct().count())
    // every sketch stays inside the audited 10% bound
    assert(prof.values.forall(_.getBoolean(3)), "HLL estimates within 10%")
  }

  test("j04: per-group top-N keeps exactly the N best per key") {
    val rows = SparkEntry.queries("j04_top_per_group")(spark, sf).collect()
    val byPrio = rows.groupBy(_.getString(0))
    assert(byPrio.nonEmpty)
    byPrio.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      // prices are non-increasing with rank
      val prices = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(prices.zip(prices.tail).forall { case (hi, lo) => hi >= lo })
    }
  }
}
