package graft.examples

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** Direct cost receipt for the one-pass counting kernels
  * ([[graft.plans.NibbleCounts]] / [[graft.plans.CharClassCounts]] —
  * round 10's answer to the m07 JIT-churn finding): the same
  * character-entropy computation over the sf0.1 documents with texts
  * lengthened ×`rep` (repeat — web-scale document lengths, where the
  * kernel is the hot loop), counted two ways:
  *
  *  - composed: one `length - length(replace)` pair per alphabet
  *    character — 27 full-string scans + 27 allocations per row, the
  *    pre-round-10 t13 form;
  *  - native: ONE `char_class_counts` pass.
  *
  * Both feed the identical entropy fold, and the probe asserts the two
  * variants' INTEGER COUNTS are exactly equal before timing (per-lang
  * long sums — the same invariant t13's oracle parity rides on; float
  * aggregates from independent jobs are not comparison-safe, their
  * partial-merge order is nondeterministic). Per-row work is
  * alphabet×|text| for composed vs |text| for native, so the gap
  * WIDENS with document length — the 100 TB story, measured.
  *
  * Usage: `sbt "runMain graft.examples.KernelProbe [rep]"` (default
  * 20 — ≈ 10 KB docs). */
object KernelProbe {
  private val Base = "/root/testdata/sf0.1"
  private val Alphabet = ('a' to 'z').mkString + " "

  def main(args: Array[String]): Unit = {
    val rep = if (args.nonEmpty) args(0).toInt else 20
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.rebalance(spark,
      spark.read.parquet(s"$Base/documents.parquet")
        .select(col("lang"), repeat(lower(col("text")), rep).as("t"))
        .filter(length(col("t")) > 0))
      .localCheckpoint() // both variants read one materialization
    val meanLen = docs.agg(avg(length(col("t")))).first().getDouble(0)
    println(f"[kernel] corpus=${docs.count()}%,d docs, mean length $meanLen%,.0f chars (rep=$rep)")

    def entropy(counts: Seq[Column]): Column = {
      val n = length(col("t")).cast("double")
      def term(c: Column) = when(c > 0, (c / n) * log(c / n)).otherwise(lit(0.0))
      -(counts.map(term).reduce(_ + _) + term(n - counts.reduce(_ + _)))
    }
    def agg(withEnt: DataFrame): DataFrame =
      withEnt.groupBy("lang")
        .agg(graft.functions.Num.oround(avg("ent"), 4).as("avg_entropy"))
        .orderBy("lang")
    val composed = agg(docs.select(col("lang"), col("t"), entropy(
      Alphabet.map(ch =>
        (length(col("t")) - length(replace(col("t"), lit(ch.toString), lit(""))))
          .cast("double"))).as("ent")))
    val nativeSrc = docs.select(col("lang"), col("t"),
      call_function("char_class_counts", col("t"), lit(Alphabet)).as("cc"))
    val native = agg(nativeSrc
      .select(col("lang"), col("t"), entropy(
        Alphabet.indices.map(i => element_at(col("cc"), i + 1).cast("double"))).as("ent")))

    // Parity on the EXACT integer counts (per-lang long sums — order-free
    // across any shuffle), not on the float aggregates: the two variants
    // run as independent jobs whose avg() partials merge in
    // nondeterministic shuffle order, so the rounded entropies could
    // differ in an ulp even with identical per-row inputs. The counts are
    // what the kernels compute; the entropy fold on top is the same
    // expression tree in both variants.
    def countSums(src: DataFrame, cs: Seq[Column]): Seq[org.apache.spark.sql.Row] =
      src.groupBy("lang")
        .agg(sum(cs.head.cast("long")).as("s0"),
          cs.tail.zipWithIndex.map { case (c, i) =>
            sum(c.cast("long")).as(s"s${i + 1}") }: _*)
        .orderBy("lang").collect().toSeq
    val composedCounts: Seq[Column] = Alphabet.map(ch =>
      length(col("t")) - length(replace(col("t"), lit(ch.toString), lit(""))))
    val nativeCounts: Seq[Column] =
      Alphabet.indices.map(i => element_at(col("cc"), i + 1).cast("long"))
    require(countSums(docs, composedCounts) == countSums(nativeSrc, nativeCounts),
      "kernel variants diverged — counts are not identical")

    def time2(df: DataFrame): (Double, Double) = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      (once(), once())
    }
    val (c1, c2) = time2(composed)
    val (n1, n2) = time2(native)
    val (tc, tn) = (math.min(c1, c2), math.min(n1, n2))
    println(f"[kernel] composed (27x length-replace): $tc%6.2f s  (runs $c1%.2f/$c2%.2f)")
    println(f"[kernel] native (char_class_counts):    $tn%6.2f s  (runs $n1%.2f/$n2%.2f)")
    println(f"[kernel] speedup ${tc / tn}%.1fx at $meanLen%,.0f-char docs")
    spark.stop()
  }
}
