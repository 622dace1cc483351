package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: registered views + the extension-registered custom
  * function serve plain spark.sql users. */
class CatalogSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("all tables queryable through spark.sql after registerAll") {
    Catalog.registerAll(spark, "/root/testdata/sf0.001")
    Catalog.tableNames.foreach { t =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $t").collect().head.getLong(0) > 0, t)
    }
  }

  test("TPC-H Q1 shape through pure SQL matches the DataFrame query") {
    Catalog.registerAll(spark, "/root/testdata/sf0.001")
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(avg(l_quantity) * 100, 0) / 100 AS avg_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(_.toSeq).toSeq
    val df = SparkEntry.queries("q04_group_avg")(spark, "/root/testdata/sf0.001")
      .select("l_returnflag", "l_linestatus", "avg_qty", "n")
      .collect().map(_.toSeq).toSeq
    assert(sql == df)
  }

  test("approx sketch: HLL distinct count within 5% of exact") {
    Catalog.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      """SELECT approx_count_distinct(o_custkey) AS approx,
        |  count(DISTINCT o_custkey) AS exact FROM orders""".stripMargin)
      .collect().head
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL estimate $approx vs exact $exact")
  }
}
