package graft.examples

import org.apache.spark.sql.functions._

import graft.streaming.NearDup

/** The ADVERSARIAL q54 load (round-12 verdict item 4): a template farm
  * with PER-COPY PERTURBATIONS. The exact tier collapses byte-equal
  * copies (the measured 7.5 → 377 s guard), but a perturbed copy is its
  * own exact class — every copy reaches the near tier, all copies share
  * most band keys, and the in-batch band join enumerates |copies|²
  * pairs. A stream cannot df-cap retroactively, so the question is
  * whether the batch step cliffs, and whether the capped policy
  * (NearDup's `bandCap`, the d02 bucket discipline with a surfaced
  * census) removes the cliff.
  *
  * Axis: one micro-batch of N perturbed copies of a 200-token template
  * (every 20th token copy-unique → pairwise bigram Jaccard ≈ 0.82,
  * above the 0.8 verify threshold — REAL near-dups, the hardest case),
  * driven through the IDENTICAL `NearDup.processBatch` the stream runs,
  * against a fresh index seeded with the sf0.01 corpus. Uncapped
  * should grow ~4× per copy doubling; capped should stay flat with the
  * census row recording the drop.
  *
  * Usage: runMain graft.examples.Q54AdversarialProbe [sfDir] [maxCopies]
  */
object Q54AdversarialProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxCopies = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = graft.Engine.session()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val nDocs = docs.count()

    def farm(n: Int) = spark.range(n).select(
        (col("id") + lit(10000000L)).as("doc_id"),
        array_join(
          transform(sequence(lit(1), lit(200)), i =>
            when(i % 20 === 0, concat(lit("p"), col("id"), lit("x"), i))
              .otherwise(concat(lit("tmpl"), i))),
          " ").as("text"))
      .localCheckpoint()

    val root = s"/tmp/q54adv_${ProcessHandle.current().pid()}"
    println(f"${"copies"}%7s ${"capped"}%7s ${"wall_s"}%8s ${"pairs_out"}%10s " +
      f"${"census"}%30s")
    for (n <- Iterator.iterate(500)(_ * 2).takeWhile(_ <= maxCopies);
         capped <- Seq(true, false)) {
      val base = s"$root/n${n}_$capped"
      // fresh index per cell, seeded with the normal corpus
      NearDup.processBatch(docs, 0L, s"$base/res", s"$base/band",
        s"$base/exact", targetRowsPerBucket = 256L,
        bandCap = if (capped) Some(graft.streaming.NearDup.StreamBandCap)
          else None)
      val t0 = System.nanoTime()
      NearDup.processBatch(farm(n), 1L, s"$base/res", s"$base/band",
        s"$base/exact", targetRowsPerBucket = 256L,
        bandCap = if (capped) Some(graft.streaming.NearDup.StreamBandCap)
          else None)
      val wall = (System.nanoTime() - t0) / 1e9
      val pairs = spark.read.parquet(s"$base/res")
        .filter(col("doc_id") >= 10000000L).count()
      val census =
        try {
          val c = spark.read.parquet(s"$base/res_capcensus")
            .orderBy(col("batch_id")).collect()
          c.map(r => s"keys=${r.getLong(1)} max=${r.getLong(2)} " +
            s"pairs_dropped<=${r.getLong(3)}").mkString("; ")
        } catch { case _: Throwable => "" }
      println(f"$n%7d $capped%7s $wall%8.2f $pairs%10d $census%30s")
    }
    spark.stop()
  }
}
