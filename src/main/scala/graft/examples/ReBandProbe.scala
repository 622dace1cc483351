package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Engine
import graft.functions.VectorFns
import graft.streaming.AnnStream

/** The q60 re-banding growth axis (round-13 seed 2's "Done" clause):
  * stream ~16× past the seed corpus under BOTH width policies and
  * measure what the stale width costs and what re-banding pays.
  *
  *  - PINNED (the declared q60): the seed width never moves, so bucket
  *    occupancy — and with it per-query candidate mass — grows
  *    linearly with stream age.
  *  - REBAND: every size-ratio fold recomputes `bk` at
  *    `adaptiveSrpBits(current rows)`; occupancy stays ~constant, so
  *    query-side cost flattens while recall against the exact top-10
  *    (sampled query panel, fixed budget — v24's discipline) holds.
  *
  * Seed = sf0.1 embeddings (20k vecs, target 64 → 9 seed bits); 8
  * batches of 2 id-shifted copies each → ~16× growth, width rule
  * ending at 13 bits. Three readings per policy: per-batch ingest wall
  * (query + append + fold maintenance together), then a QUERY-ONLY
  * replay of the last batch against the final index (probe + rank, no
  * append/fold — the cost a search-heavy deployment cares about) with
  * its candidate-pair mass, and recall on a 200-query hash-ranked
  * panel against brute-force cosine over the full accumulated corpus
  * under the same partner rule.
  *
  * Run: `sbt "runMain graft.examples.ReBandProbe"`.
  */
object ReBandProbe {
  private val Base = "/root/testdata/sf0.1"
  private val Target = 64L

  def main(args: Array[String]): Unit = {
    // Optional seed multiplier (round-16 verdict task 4: "largest
    // feasible seed" — a receipt at a decade beyond the ×16 the
    // original axis reaches). seedMult R > 1 seeds the index with R×
    // id-shifted corpus copies BEFORE streaming the same 8 batches;
    // the recall block is skipped at R > 1 (the ×1 recall receipt
    // stands; the exact reference's crossJoin grows with R and the
    // large-seed question is per-batch WALL, not recall).
    val seedMult = args.headOption.map(_.toInt).getOrElse(1)
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = spark.read.parquet(s"$Base/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = vecs.count()
    val stride = 1000000L
    def shifted(r: Int): DataFrame = vecs.select(
      (col("vec_id") + lit(r * stride)).as("vec_id"), col("embedding"))
    // seed replicas live at shift ≥ 100 — disjoint from the 1..16
    // batch shifts, so batch ids never collide with seed ids
    val seedCorpus =
      if (seedMult <= 1) vecs
      else (vecs +: (0 until seedMult - 1).map(j => shifted(100 + j)))
        .reduce(_ unionByName _).localCheckpoint()
    val seedBits = VectorFns.adaptiveSrpBits(n * seedMult, Target)
    val batches = (0 until 8).map(i =>
      (shifted(2 * i + 1) unionByName shifted(2 * i + 2)).localCheckpoint())

    def run(reband: Boolean): (Seq[Double], DataFrame, String) = {
      val root = java.nio.file.Files.createTempDirectory(
        s"graft_rebandprobe_$reband").toString
      val (res, idx) = (s"$root/res", s"$root/idx")
      AnnStream.seedHistory(spark, seedCorpus, idx, seedBits,
        targetRowsPerBucket = Target, minBuckets = 4)
      val secs = batches.zipWithIndex.map { case (b, i) =>
        val t0 = System.nanoTime()
        AnnStream.processBatch(b, i.toLong, res, idx, seedBits,
          targetRowsPerBucket = Target, minBuckets = 4, reband = reband)
        (System.nanoTime() - t0) / 1e9
      }
      (secs, spark.read.parquet(res).distinct(), idx)
    }

    /** Query-only replay of the last batch against the final index:
      * probe + candidate join + top-k, NO append/fold — isolates the
      * cost the stale width actually inflates. Returns (sec, pairs). */
    def queryOnly(idx: String, reband: Boolean): (Double, Long) = {
      val ix = AnnStream.index(spark, idx, Target, 4)
      val bits = if (reband) AnnStream.currentBits(ix, seedBits) else seedBits
      val rows = AnnStream.keyed(batches.last, bits).localCheckpoint()
      val rhs = rows.unionByName(
        ix.probe(rows.select(col("bk"))).get.select("vec_id", "e", "bk"))
      val cand = rows
        .select(col("bk"), col("vec_id").as("qid"), col("e").as("qe"))
        .join(rhs.select(
          col("bk"), col("vec_id").as("pid"), col("e").as("pe")), "bk")
        .filter(col("pid") % 5 =!= 4 || col("pid") < col("qid"))
      val t0 = System.nanoTime()
      val pairs = cand.count()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, pairs)
    }

    // exact reference for the LAST batch on a fixed 200-query panel —
    // lazy: only materialized when recall is actually read (×1 runs)
    lazy val all = (vecs +: (1 to 16).map(shifted)).reduce(_ unionByName _)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .localCheckpoint()
    lazy val lastIds = batches.last.select("vec_id")
      .withColumn("hk", (col("vec_id") * lit(40503L) + lit(7L)) % lit(104729L))
      .orderBy(col("hk"), col("vec_id")).limit(200).select("vec_id")
      .localCheckpoint()
    lazy val q = all.join(lastIds, "vec_id")
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    lazy val exact = all.select(col("vec_id").as("pid"), col("e").as("pe"))
      .crossJoin(broadcast(q))
      .filter(col("pid") % 5 =!= 4 || col("pid") < col("qid"))
      .select(col("qid"), col("pid"),
        graft.functions.Num.oround(
          VectorFns.cosine(col("qe"), col("pe")), 4).as("cs"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("cs").desc, col("pid"))))
      .filter(col("rk") <= 10)
      .select(col("qid"), col("pid")).localCheckpoint()

    def recall(res: DataFrame): Double = {
      val hits = res.join(lastIds, "vec_id")
        .select(col("vec_id").as("qid"), col("neighbor").as("pid"))
        .join(exact, Seq("qid", "pid"), "left_semi").count()
      hits.toDouble / (lastIds.count() * 10.0)
    }

    for (rb <- Seq(false, true)) {
      val (secs, res, idx) = run(rb)
      val label = if (rb) "reband" else "pinned"
      println(s"== seedMult=x$seedMult (${n * seedMult} seed vecs) ==")
      println(f"$label  per-batch ingest s: ${secs.map(x => f"$x%.2f").mkString(" ")}")
      val (qs, pairs) = queryOnly(idx, rb)
      println(f"$label  query-only last batch: $qs%.2f s, candidate pairs=$pairs")
      if (seedMult <= 1)
        println(f"$label  last-batch recall@10 vs exact: ${recall(res)}%.3f")
      else println(s"$label  recall skipped at seedMult > 1 (×1 receipt stands)")
    }
    spark.stop()
  }
}
