package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Salting must change the distribution, never the answer: results are
  * checked equal to the unsalted plans on a deliberately skewed dataset
  * (one key owning ~90% of rows). */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // 9000 rows for hot key 1, ~1000 spread over keys 2..100
  private lazy val skewed = spark.range(10000)
    .select(
      col("id"),
      when(col("id") < 9000, 1L).otherwise(pmod(col("id"), lit(99L)) + 2L).as("k"),
      (col("id") % 7).cast("double").as("v"))
    .cache()

  private lazy val dim = (1L to 100L).map(k => (k, s"name_$k")).toDF("dk", "name")

  test("salted join equals plain join on skewed keys") {
    val plain = skewed.join(dim, col("k") === col("dk"))
      .select("id", "k", "name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", col("id"), 8)
      .select("id", "k", "name").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size == 10000)
  }

  test("salted join spreads the hot key over all salt buckets") {
    val spread = skewed.withColumn("__salt", Skew.salt(col("id"), 8))
      .filter(col("k") === 1)
      .groupBy("__salt").count().collect()
    assert(spread.length == 8, "hot key must occupy every bucket")
    assert(spread.map(_.getLong(1)).max < 9000, "no bucket owns the whole key")
  }

  test("two-phase salted aggregation equals direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"), max("v").as("max_v"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    val salted = Skew.twoPhaseAgg(
      skewed, Seq("k"), col("id"), 8,
      Map("v" -> "sum", "id" -> "count"))
      .collect().map(r => (r.getAs[Long]("k"), (r.getAs[Double]("sum_v"), r.getAs[Long]("count_id")))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (s, n)) =>
      val (ds, dn, _) = direct(k)
      assert(n == dn, s"count mismatch for $k")
      assert(math.abs(s - ds) < 1e-9, s"sum mismatch for $k")
    }
  }
}
