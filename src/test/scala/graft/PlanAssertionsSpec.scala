package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan shapes the engine's performance story depends
  * on (PLANS.md receipts): if a Catalyst upgrade or a query edit
  * silently regresses one of these, the perf claim breaks before the
  * benchmark notices. */
class PlanAssertionsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // drive THIS QueryExecution so AQE's final plan is printed
    df.queryExecution.executedPlan.toString
  }

  test("j04: per-group top-N plans through WindowGroupLimit") {
    val plan = executedPlan("j04_top_per_group")
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=3 must trigger WindowGroupLimit, got:\n$plan")
  }

  test("j02: banded range join is an equi-join, never a nested loop") {
    val plan = executedPlan("j02_banded_range_join")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banding must keep the range join an equi-join, got:\n$plan")
  }

  test("q27: the correlated subquery is decorrelated to an aggregate + join") {
    val plan = executedPlan("q27_sql_correlated")
    assert(plan.contains("HashAggregate"),
      s"decorrelation must produce a one-pass aggregate, got:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"decorrelated plan must not fall back to a nested loop, got:\n$plan")
  }

  test("d02: bucket-local LSH verification runs with ZERO joins") {
    val plan = executedPlan("d02_minhash_lsh_pairs")
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct").foreach(j =>
      assert(!plan.contains(j), s"d02 must be join-free, found $j in:\n$plan"))
  }

  test("q13: top-20 is TakeOrderedAndProject, dimensions broadcast") {
    val plan = executedPlan("q13_join_tpch_q3")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must avoid a global sort, got:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"filtered dimensions must broadcast, got:\n$plan")
  }

  test("q02: the whole predicate reaches the parquet scan") {
    val df = SparkEntry.queries("q02_filter_count")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)"),
      s"filters must push into the scan, got:\n$plan")
  }
}
