package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** The ×K EDGE-COUNT scale probe for the iterative graph family — the
  * one family axis not covered by DocCountProbe (which measures g04's
  * ubiquity cap only). Staging: `copies` offset copies of orders
  * (fresh custkeys) and lineitem (offset orderkeys, SUPPKEYS KEPT) —
  * so the supplier↔customer bipartite graph gains ×K customers wired
  * to the SAME suppliers: |E| grows ×K, supplier (hub) degree grows
  * ×K, |V| grows sub-linearly. This is the adversarial direction for
  * superstep algorithms: per-iteration cost must stay O(|E|) shuffle
  * (α ≈ 1 — supersteps are inherently edge-linear, unlike the capped
  * dedup queries whose α should be ≪ 1), and hub-degree growth must
  * NOT super-linearize the rank⋈edges join (no per-key quadratic
  * anywhere; skewed join sides are AQE's problem, and the rank side
  * is |V| rows of two columns).
  *
  * Census first (|E|, max degree, |V|), then α per query:
  * α = log(t_K / t_1) / log(K); α ≈ 1 expected, α > 1 is a scale bug
  * on this axis.
  *
  * Usage: `sbt "runMain graft.examples.GraphScaleProbe [copies]"`
  * (default 10; PLANS.md records the measured table).
  */
object GraphScaleProbe {
  private val Base = "/root/testdata/sf0.1"

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = stage(spark, copies)
    println(s"probe estate: $dir (sf0.1 orders+lineitem x$copies, suppkeys shared)")

    def census(d: String): (Long, Long, Long) = {
      val pairs = spark.read.parquet(s"$d/lineitem.parquet")
        .select(col("l_orderkey").as("ok"),
          (col("l_suppkey") + lit(1000000L)).as("supp"))
        .join(spark.read.parquet(s"$d/orders.parquet")
          .select(col("o_orderkey").as("ok"), col("o_custkey").as("cust")), "ok")
        .select("supp", "cust").distinct()
      val r = pairs.agg(
        count(lit(1)).as("e"), countDistinct("cust").as("nc")).collect()(0)
      val md = pairs.groupBy("supp").agg(count(lit(1)).as("d"))
        .agg(max("d")).collect()(0).getLong(0)
      (r.getLong(0), r.getLong(1), md)
    }
    val (e1, v1, md1) = census(Base)
    val (eK, vK, mdK) = census(dir)
    println(f"edges: $e1%,d -> $eK%,d (x${eK.toDouble / e1}%.1f); " +
      f"customers: $v1%,d -> $vK%,d; max supplier degree: $md1%,d -> $mdK%,d " +
      f"(x${mdK.toDouble / md1}%.1f — the hub axis)")

    val names = Seq("g01_pagerank", "g03_bfs_hops", "g05_labelprop",
      "g06_personalized_pagerank")
    println(f"${"query"}%-26s ${"base"}%8s ${"x" + copies}%8s ${"alpha"}%7s")
    names.foreach { n =>
      val t1 = time(() => graft.SparkEntry.queries(n)(spark, Base))
      val tK = time(() => graft.SparkEntry.queries(n)(spark, dir))
      val a = math.log(tK / t1) / math.log(copies.toDouble)
      println(f"$n%-26s $t1%8.2f $tK%8.2f $a%7.2f")
    }
    spark.stop()
  }

  /** ×copies offset copies: orders gets fresh orderkeys AND custkeys;
    * lineitem gets matching orderkeys with suppkeys UNCHANGED. */
  private def stage(s: SparkSession, copies: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_graphscale").toString
    def fan(df: DataFrame)(shift: (DataFrame, Long) => DataFrame): DataFrame =
      (0 until copies).map(i => shift(df, i.toLong)).reduce(_ unionByName _)
    fan(s.read.parquet(s"$Base/orders.parquet"))((d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L)))
      .coalesce(8).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    fan(s.read.parquet(s"$Base/lineitem.parquet"))((d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
      .coalesce(8).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // g03/g05 read customer/nation too — copy through unchanged (the
    // probe grows edges, not the dimension tables)
    Seq("customer.parquet", "nation.parquet", "supplier.parquet").foreach { t =>
      s.read.parquet(s"$Base/$t").write.mode("overwrite").parquet(s"$dir/$t")
    }
    dir
  }

  /** Bench's discipline: noop-format write, two runs, min. */
  private def time(mk: () => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }
}
