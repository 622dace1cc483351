package graft.examples

import org.apache.spark.sql.functions._

import graft.Engine

/** The g-family's third-decade LINEAR-WORK receipt (round-15 verdict
  * task 2), same argument as g04's pair-mass count: the iterative
  * graph queries (g01/g03/g05/g06) all run k fixed supersteps over
  * the SAME materialized (src, dst) edge table — per-superstep work is
  * one shuffle join + one partial agg over edge mass, so if |edges|
  * scales ×k with the estate, superstep work is linear by
  * construction. A FULL g01 run at sf100 exhausted a one-box disk
  * (40+ GB spill from the edge localCheckpoint + three iteration
  * shuffles — killed at 9.3 GB free, round 16); the cluster story is
  * the same as g04's: per-executor spill at 1000 executors is ~1/1000
  * of the one-box bill. This probe counts the distinct bipartite
  * (supp, cust) edge mass — g01's exact edge definition — per estate.
  *
  * Run: `HEAP=96g tools/run_main.sh graft.examples.GraphMassProbe
  *   /tmp/sf10 /tmp/sf100` */
object GraphMassProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      Engine.tuneForEstate(spark, d)
      val t0 = System.nanoTime()
      val pairs = spark.read.parquet(s"$d/lineitem.parquet")
        .select(col("l_orderkey").as("ok"),
          (col("l_suppkey") + lit(1000000L)).as("supp"))
        .join(spark.read.parquet(s"$d/orders.parquet")
          .select(col("o_orderkey").as("ok"), col("o_custkey").as("cust")), "ok")
        .select("supp", "cust").distinct()
        .count()
      println(f"$d%-12s edges=${2 * pairs}%,d wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
