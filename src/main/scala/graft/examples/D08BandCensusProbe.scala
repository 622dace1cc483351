package graft.examples

import org.apache.spark.sql.functions._

import graft.Engine
import graft.queries.DedupQueries

/** d08's band-key census at decade scale (round-15 verdict task 7).
  *
  * d08's scale story rests on two assumptions the round-9 rewiden made:
  * (1) 15-bit band keys are SPARSE — real-text simhash bands don't pile
  * onto a few values, so the expected bucket stays far under the
  * [[DedupQueries.PairBlockCap]] df-cap and the band self-join's
  * candidate mass stays linear in the corpus; (2) whatever piles up
  * anyway (exact-dup template mass) is the cap's job, and the dropped
  * mass is small relative to the kept mass. Both are row-count claims,
  * so this probe MEASURES them per estate instead of trusting the
  * birthday arithmetic: occupancy quantiles over the uncapped (j, band)
  * buckets, cap-exceeding bucket census, dropped-vs-kept candidate pair
  * mass, and the naive uniform-hash expectation (4·docs / 131072) for
  * contrast — natural-text bands are NOT uniform, which is exactly what
  * the quantile table shows.
  *
  * Reading the receipt for the NEXT decade: kept pair mass per doc and
  * p99 occupancy should hold roughly constant across sf1 → sf10 →
  * sf100; a p99 that walks toward the cap, or a dropped-mass fraction
  * that grows with SF, means the 4×15-bit design has run out of
  * keyspace and the bands must re-widen (wider simhash, more band
  * indexes, or a higher cap with the oracle's HAVING bound moved in
  * lockstep).
  *
  * Usage: `sbt "runMain graft.examples.D08BandCensusProbe [sfDir...]"`
  * (defaults to /root/testdata/sf0.1). One row per estate.
  */
object D08BandCensusProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val cap = DedupQueries.PairBlockCap

    println(f"${"estate"}%-14s ${"docs"}%12s ${"keys"}%9s ${"unif_E"}%7s " +
      f"${"p50"}%5s ${"p99"}%6s ${"max"}%8s ${"n>cap"}%7s " +
      f"${"drop_pairs"}%12s ${"kept_pairs"}%12s ${"kept/doc"}%9s")
    for (d <- dirs) {
      // uncapped band table: (doc_id, simhash, bk) — 10 rows per doc
      val banded = DedupQueries.d08Banded(spark, d, cap = None)
        .localCheckpoint()
      val nDocs = banded.count() / 10
      val buckets = banded.groupBy("bk")
        .agg(count(lit(1)).as("bn"))
        .localCheckpoint()
      val row = buckets.agg(
        count(lit(1)).as("keys"),
        expr("approx_percentile(bn, 0.5)").as("p50"),
        expr("approx_percentile(bn, 0.99)").as("p99"),
        max(col("bn")).as("mx"),
        sum(when(col("bn") > cap, 1L).otherwise(0L)).as("nOver"),
        // the df-cap DROPS buckets over cap entirely; singletons pair nothing
        sum(when(col("bn") > cap, col("bn") * (col("bn") - 1))
          .otherwise(0L)).as("dropMass2"), // 2× pair mass: stays integral
        sum(when(col("bn").between(2, cap), col("bn") * (col("bn") - 1))
          .otherwise(0L)).as("keptMass2")).head()
      val unifE = nDocs / (1L << 24).toDouble // 10·docs rows / 10·2²⁴ keys
      println(f"${d.split('/').last}%-14s $nDocs%,12d ${row.getLong(0)}%,9d " +
        f"$unifE%7.1f ${row.getLong(1)}%5d ${row.getLong(2)}%6d " +
        f"${row.getLong(3)}%,8d ${row.getLong(4)}%,7d " +
        f"${row.getLong(5) / 2}%,12d ${row.getLong(6) / 2}%,12d " +
        f"${row.getLong(6).toDouble / 2 / nDocs}%9.2f")
    }
    spark.stop()
  }
}
