package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[graft.plans.BoundLevenshtein]] optimizer rule: threshold
  * comparisons of unbounded levenshtein must leave the optimizer in
  * the banded early-abandon form, results unchanged. */
class BoundLevenshteinSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Bounded levenshtein occurrences in the optimized plan. Parquet
    * scans keep the plan non-local (an in-memory relation would be
    * collapsed by ConvertToLocalRelation before anything is visible). */
  private def boundedCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { p =>
      p.expressions.flatMap(_.collect {
        case l: Levenshtein if l.threshold.isDefined => l
      })
    }.flatten.size

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("lev <= k, lev < k, and literal-first forms rewrite to banded") {
    assert(boundedCount(docs.filter(levenshtein(col("text"), lit("foo")) <= 5)) == 1)
    assert(boundedCount(docs.filter(levenshtein(col("text"), lit("foo")) < 5)) == 1)
    assert(boundedCount(docs.filter(lit(5) >= levenshtein(col("text"), lit("foo")))) == 1)
    assert(boundedCount(docs.filter(lit(5) > levenshtein(col("text"), lit("foo")))) == 1)
  }

  test("projected distances and unsafe forms stay unbounded") {
    // value is needed, not a test — must not rewrite
    assert(boundedCount(docs.select(levenshtein(col("text"), lit("foo")).as("d"))) == 0)
    // lev > k selects the FAR side — the banded form cannot express it
    assert(boundedCount(docs.filter(levenshtein(col("text"), lit("foo")) > 5)) == 0)
    // non-literal threshold: no rewrite
    assert(boundedCount(
      docs.filter(levenshtein(col("text"), lit("foo")) <= length(col("lang")))) == 0)
  }

  test("rewritten filter returns the same rows as the unbounded form") {
    val rows = Seq(("kitten", "sitting"), ("abc", "abd"), ("same", "same"),
      (null.asInstanceOf[String], "x")).toDF("a", "b")
    val kept = rows.filter(levenshtein(col("a"), col("b")) <= 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // kitten→sitting is distance 3 (dropped); the null row yields a null
    // predicate in BOTH forms (dropped)
    assert(kept == Set(("abc", "abd"), ("same", "same")))
    val keptStrict = rows.filter(levenshtein(col("a"), col("b")) < 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(keptStrict == Set(("same", "same")))
  }
}
