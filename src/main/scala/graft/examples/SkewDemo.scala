package graft.examples

import org.apache.spark.sql.functions._

import graft.Engine
import graft.ops.Skew

/** Example: salting a hot key. Builds a corpus where one key owns 90%
  * of rows, then runs the salted join and the two-phase salted
  * aggregation, printing the per-bucket spread of the hot key.
  *
  * Usage: `sbt "runMain graft.examples.SkewDemo"`
  */
object SkewDemo {
  def main(args: Array[String]): Unit = {
    val spark = Engine.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val skewed = spark.range(100000)
      .select(
        col("id"),
        when(col("id") < 90000, 1L).otherwise(pmod(col("id"), lit(999L)) + 2L).as("k"),
        (col("id") % 7).cast("double").as("v"))
    val dim = (1L to 1000L).map(k => (k, s"name_$k")).toDF("dk", "name")

    val joined = Skew.saltedJoin(skewed, dim, "k", "dk", col("id"), 16)
    println("salted join rows: " + joined.count() + " (expect 100000)")

    println("hot-key spread over 16 salt buckets:")
    skewed.filter(col("k") === 1)
      .withColumn("salt", Skew.salt(col("id"), 16))
      .groupBy("salt").count().orderBy("salt")
      .show(16)

    val agg = Skew.twoPhaseAgg(skewed, Seq("k"), col("id"), 16,
      Map("v" -> "sum", "id" -> "count"))
    println("two-phase agg groups: " + agg.count() + " (expect 1000)")
    agg.filter(col("k") === 1).show()
    spark.stop()
  }
}
