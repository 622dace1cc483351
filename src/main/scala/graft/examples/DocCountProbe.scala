package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.queries.DedupQueries

/** The ×10 DOCUMENT-COUNT scale probe (PLANS.md round-9; the axis the
  * round-6/7 probes never ran): the sf0.1 corpus unioned as `copies`
  * doc_id-offset copies with IDENTICAL texts — so exact-dup classes
  * deepen ×copies, every LSH band bucket and fingerprint block gains
  * ×copies members, trigram posting lists lengthen ×copies, and the
  * co-purchase graph gains ×copies customers per part. This is the
  * growth mode a template-heavy web crawl actually has, and it drives
  * exactly the structures the caps/star-edges are supposed to bound:
  *
  *  - d13's df ≤ 20 posting cap: lists that lengthen past the cap DROP
  *    OUT of pair emission (pair mass must stay linear, or shrink);
  *  - d02's (band, bh) bucket cap: buckets > PairBlockCap are censused
  *    out, pair time stays flat;
  *  - d06's class collapse: ×copies docs collapse into the SAME number
  *    of classes (star edges grow linearly, rep LSH work not at all);
  *  - g04's np ≤ 40 ubiquity cap: parts bought by > 40 customers leave
  *    wedge enumeration, so wedge growth is bounded by the cap, not
  *    customer count.
  *
  * Usage: `sbt "runMain graft.examples.DocCountProbe [copies]"`
  * (default 10). α = log(t_big / t_base) / log(copies) — α=1 is linear
  * scaling at any fan-out, α>1 super-linear (a scale bug on this
  * axis). */
object DocCountProbe {
  private val Base = "/root/testdata/sf0.1"

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = stage(spark, copies)
    println(s"probe estate: $dir (sf0.1 x $copies doc_id/custkey-offset copies)")

    // structure censuses first — the counts the α story is about
    val starBase = DedupQueries.lshComponentEdges(spark, Base).count()
    val starBig = DedupQueries.lshComponentEdges(spark, dir).count()
    println(f"d06 star+rep edges: base=$starBase%,d x$copies=$starBig%,d " +
      f"(linear in members, class count fixed)")
    val d02big = DedupQueries.lshVerifiedPairs(spark, dir)
    val d02n = d02big.collect().length
    val cen = d02big.queryExecution.observedMetrics("d02_bucket_census")
    println(f"d02 at x$copies: pairs=$d02n%,d, max bucket " +
      f"${cen.getAs[Long]("max_block_size")}%,d, censused-out pair mass " +
      f"${cen.getAs[Double]("dropped_pair_mass")}%,.0f")
    val d13base = query(spark, Base, "d13_containment")().count()
    val d13big = query(spark, dir, "d13_containment")().count()
    println(f"d13 top-k output rows: base=$d13base%,d x$copies=$d13big%,d " +
      f"(bounded top-k; the df cap drops lengthened posting lists pre-join)")
    val g04base = query(spark, Base, "g04_copurchase_jaccard")().count()
    val g04big = query(spark, dir, "g04_copurchase_jaccard")().count()
    println(f"g04 output pairs: base=$g04base%,d x$copies=$g04big%,d " +
      f"(np<=40 ubiquity cap ejects parts whose buyer lists deepened past it)")

    val rows = Seq(
      "d01_fingerprint_blocks" -> both(spark, dir, "d01_fingerprint_blocks"),
      "d02_minhash_lsh_pairs" -> both(spark, dir, "d02_minhash_lsh_pairs"),
      "d06_components_build" -> (
        time(() => graft.ops.ConnectedComponents
          .run(DedupQueries.lshComponentEdges(spark, Base))),
        time(() => graft.ops.ConnectedComponents
          .run(DedupQueries.lshComponentEdges(spark, dir)))),
      "d13_containment" -> both(spark, dir, "d13_containment"),
      "g04_copurchase_jaccard" -> both(spark, dir, "g04_copurchase_jaccard"))
    println(f"${"query"}%-24s ${"base"}%8s ${"x" + copies}%8s ${"alpha"}%7s")
    rows.foreach { case (n, (t1, t10)) =>
      // normalize by the actual fan-out so α=1 means linear for ANY
      // `copies`, not just the default 10 (round-9 review finding)
      val a = math.log(t10 / t1) / math.log(copies.toDouble)
      println(f"$n%-24s $t1%8.2f $t10%8.2f $a%7.2f")
    }
    spark.stop()
  }

  /** sf0.1 tables with `copies` offset copies: documents (same text,
    * offset doc_id — exact-dup classes deepen), orders (offset orderkey
    * AND custkey — new customers buying the SAME parts) and lineitem
    * (offset orderkey, partkey KEPT — per-part buyer lists deepen). */
  private def stage(s: SparkSession, copies: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_doccount").toString
    def fan(df: DataFrame)(shift: (DataFrame, Long) => DataFrame): DataFrame =
      (0 until copies).map(i => shift(df, i.toLong)).reduce(_ unionByName _)
    fan(s.read.parquet(s"$Base/documents.parquet"))((d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .coalesce(8).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    fan(s.read.parquet(s"$Base/orders.parquet"))((d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L)))
      .coalesce(8).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    fan(s.read.parquet(s"$Base/lineitem.parquet"))((d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
      .coalesce(8).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def query(s: SparkSession, dir: String, name: String): () => DataFrame =
    () => graft.SparkEntry.queries(name)(s, dir)

  private def both(s: SparkSession, dir: String, name: String): (Double, Double) =
    (time(query(s, Base, name)), time(query(s, dir, name)))

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
