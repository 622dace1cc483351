package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Engine

/** Per-superstep WALLS for the fixed-k iterative graph queries
  * (round-16 verdict task 3b): g03 BFS (4 rounds), g05 label
  * propagation (2 rounds), g06 personalized PageRank (3 iterations).
  * The family's scaling argument says per-superstep work is one
  * shuffle join + one agg over edge mass — i.e. walls should grow
  * roughly LINEARLY in superstep count, with no blow-up in later
  * rounds (the frontier/labels stay |V|-bounded). This probe times
  * cumulative k-superstep prefixes of each query's production loop at
  * one SF dir; neighbor differences attribute the per-round bill.
  *
  * Shapes are the production ones (GraphQueries g03:130, g05:309,
  * g06:364 — same checkpointed-edge iteration discipline), with only
  * the loop bound parameterized.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/tmp/sf10 sbt "runMain
  *   graft.examples.GraphSuperstepWallsProbe /tmp/sf10"` */
object GraphSuperstepWallsProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf10")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val width = Engine.tuneForEstate(spark, d)
    println(s"estate=$d width=$width")

    def pairs: DataFrame = spark.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey").as("ok"),
        (col("l_suppkey") + lit(1000000L)).as("supp"))
      .join(spark.read.parquet(s"$d/orders.parquet")
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("cust")), "ok")
      .select("supp", "cust").distinct()
    def rawEdges: DataFrame = pairs
      .select(col("supp").as("src"), col("cust").as("dst"))
      .unionAll(pairs.select(col("cust").as("src"), col("supp").as("dst")))

    // routed through the ONE harness sweep so pinned shared artifacts
    // survive here too (round-18 advisory; the probe's own per-step
    // checkpoints are unpinned and still released)
    def unpersistAll(): Unit = Engine.sweepPersistentRDDs(spark)
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label wall=${(System.nanoTime() - t0) / 1e9}%7.1f s")
      unpersistAll()
      System.gc()
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- g03: BFS, production k = 4 ----
    for (k <- 1 to 4) timed(f"g03 k=$k") {
      val edges = rawEdges.localCheckpoint()
      val seed = spark.range(1).select(lit(1L).as("id"), lit(0).as("dist"))
      val dist = (1 to k).foldLeft(seed) { (cur, _) =>
        cur.unionByName(
          cur.join(edges, cur("id") === edges("src"))
            .select(col("dst").as("id"), (col("dist") + 1).as("dist")))
          .groupBy("id").agg(min("dist").as("dist"))
          .localCheckpoint()
      }
      noop(dist.orderBy("id"))
    }

    // ---- g05: majority label propagation, production k = 2 ----
    for (k <- 1 to 3) timed(f"g05 k=$k") {
      val edges = rawEdges.localCheckpoint()
      val byNode = Window.partitionBy("id").orderBy(col("c").desc, col("lbl"))
      def round(labels: DataFrame): DataFrame =
        edges.join(labels, edges("src") === labels("id"))
          .select(col("dst").as("id"), col("lbl"))
          .groupBy("id", "lbl").agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(byNode))
          .filter(col("rn") === 1)
          .select(col("id"), col("lbl"))
          .localCheckpoint()
      val l0 = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl"))
      val lk = (1 to k).foldLeft(l0)((l, _) => round(l))
      noop(lk.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("community"))
        .limit(20))
    }

    // ---- g06: personalized PageRank, production k = 3 ----
    for (k <- 1 to 4) timed(f"g06 k=$k") {
      val edges = rawEdges
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val ew = edges.join(deg, "src").localCheckpoint()
      val seed = ew.select(min(when(col("src") < 1000000L, col("src"))).as("sid"))
      val init = ew.select(col("src").as("id")).distinct()
        .crossJoin(broadcast(seed))
        .select(col("id"),
          when(col("id") === col("sid"), 1.0).otherwise(0.0).as("r"))
      val ranks = (1 to k).foldLeft(init) { (r, _) =>
        ew.join(r, ew("src") === r("id"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("r") / col("deg")).as("m"))
          .crossJoin(broadcast(seed))
          .select(col("id"),
            (when(col("id") === col("sid"), 0.15).otherwise(0.0) +
              lit(0.85) * col("m")).as("r"))
      }
      noop(ranks.filter(col("r") > 0)
        .select(col("id"), col("r"))
        .orderBy(col("r").desc, col("id"))
        .limit(50))
    }
    spark.stop()
  }
}
