package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKByValue

/** The bounded-state top-k Aggregator must agree with the window
  * `row_number` formulation regardless of partitioning (i.e. `merge`
  * is associative/commutative and the buffer trim loses nothing), and
  * its buffer must honor the ≤k bound that makes it shuffle-safe. */
class TopKByValueSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def viaAggregator(repart: Int): Seq[(String, Long, Long)] = {
    val topk = udaf(
      new TopKByValue(3),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]())
    Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .repartition(repart)
      .groupBy("event_type")
      .agg(topk(col("event_id"), col("value")).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1L).as("rank"), col("col._1").as("event_id"))
      .orderBy("event_type", "rank")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
  }

  private def viaWindow(): Seq[(String, Long, Long)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
    Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("event_type"), col("rank"), col("event_id"))
      .orderBy("event_type", "rank")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
  }

  test("aggregator matches the window formulation under any partitioning") {
    val expected = viaWindow()
    assert(expected.nonEmpty)
    assert(viaAggregator(1) === expected)
    assert(viaAggregator(13) === expected)
  }

  test("buffer never exceeds k and trims deterministically") {
    val agg = new TopKByValue(2)
    // reduce: grows to k, then keeps the best k by (value desc, id asc)
    val b = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (4L, 1.0))
      .foldLeft(agg.zero)(agg.reduce)
    assert(b === Seq((2L, 9.0), (3L, 9.0)))
    // merge in either order gives the same trimmed buffer
    val l = Seq((7L, 3.0), (8L, 8.0))
    val r = Seq((9L, 8.0), (10L, 2.0))
    assert(agg.merge(l, r) === agg.merge(r, l))
    assert(agg.merge(l, r).size === 2)
    assert(agg.merge(l, r) === Seq((8L, 8.0), (9L, 8.0)))
  }
}
