package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Engine

/** Stage breakdown for g04's sf10 residual (α≈1.2 even after the
  * posting-list rewrite): attributes wall-clock to (1) the edge
  * pipeline — join, one pk exchange, co-located distinct, window cap;
  * (2) posting-list build + combinations explode (pair emission, no
  * aggregation); (3) + the pair-mass groupBy (the hash-agg over
  * ~C(b,2)·|parts| mostly-unique keys — the spill suspect); and counts
  * the actual pair mass so "mass grew super-linearly" vs "same mass,
  * slower agg" is a measurement, not a guess.
  *
  * Run: `sbt "runMain graft.examples.G04StageProbe /tmp/sf1 [width]"`.
  */
object G04StageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")

    def kept: DataFrame = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .join(spark.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck")), "ok")
      .select("ck", "pk")
      .repartition(col("pk"))
      .distinct()
      .withColumn("np", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("pk")))
      .filter(col("np") <= 40)
    val ds = col("ds")
    val comb = flatten(transform(ds, (a, i) =>
      transform(slice(ds, i + lit(2), size(ds)),
        b => struct(a.as("ca"), b.as("cb")))))
    def exploded: DataFrame = kept
      .groupBy("pk").agg(sort_array(collect_list("ck")).as("ds"))
      .select(explode(comb).as("p"))
      .select(col("p.ca").as("ca"), col("p.cb").as("cb"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    time("s1_kept") { noop(kept) }
    time("s2_explode") { noop(exploded) }
    time("s3_pairagg") {
      noop(exploded.groupBy("ca", "cb").agg(count(lit(1)).as("n_common")))
    }
    time("s4_mass") {
      println("pairs=" + exploded.count())
    }

    // v3 shape (degrees ride the posting list): attribute the gap
    // between the bare 2-key aggregation above and the full query
    def deg = kept.groupBy("ck").agg(count(lit(1)).as("deg"))
    val comb4 = flatten(transform(ds, (a, i) =>
      transform(slice(ds, i + lit(2), size(ds)),
        b => struct(
          a.getField("ck").as("ca"), a.getField("deg").as("da"),
          b.getField("ck").as("cb"), b.getField("deg").as("db")))))
    def exploded4: DataFrame = kept.join(deg, "ck")
      .groupBy("pk")
      .agg(sort_array(collect_list(struct(col("ck"), col("deg")))).as("ds"))
      .select(explode(comb4).as("p"))
      .select(col("p.ca").as("ca"), col("p.da").as("da"),
        col("p.cb").as("cb"), col("p.db").as("db"))
    time("v3_explode") { noop(exploded4) }
    time("v3_pairagg") {
      noop(exploded4.groupBy("ca", "cb", "da", "db")
        .agg(count(lit(1)).as("n_common")))
    }
    spark.stop()
  }
}
