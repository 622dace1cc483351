package graft.examples

import org.apache.spark.sql.functions._

/** Does q54's per-batch cost stay FLAT as the accumulated index grows?
  *
  * The round-11 layout read the FULL band/exact indexes back every
  * micro-batch — per-batch cost grew with stream age, cumulative cost
  * quadratic in stream length. The round-12 layout
  * ([[graft.streaming.BucketedIndex]]) hash-bucket-partitions both
  * indexes, prunes each batch's probe to the buckets its own keys
  * hash into, and re-buckets at compaction so bucket OCCUPANCY stays
  * ~constant — per-batch probe cost ≈ |batch keys| × occupancy,
  * independent of stream age.
  *
  * Shape of the measurement: the interesting regime is a SMALL batch
  * against a LARGE accumulated history (a crawl micro-batch vs months
  * of stream state) — so the probe SEEDS the index at three sizes
  * (×4/×8/×16 replicas of the sf corpus, texts made distinct with a
  * replica suffix token), then drives 12 fresh 50-doc batches through
  * [[graft.streaming.NearDup.processBatch]] — the IDENTICAL code
  * q54's stream runs — under BOTH layouts, reporting per batch: wall
  * seconds, total band-index rows, and the rows the batch's band
  * probe reads. Flat-as-the-index-grows = rows_read ~constant down
  * the batch column AND across the seed axis, while the plain
  * layout's rows_read IS the index size. Occupancy here is 256
  * rows/bucket (the query default 4096 is deployment occupancy; 256
  * keeps bucket files parquet-sized at probe scale — at 16 rows the
  * per-file metadata floor dominates everything, measured on the
  * first cut of this probe).
  *
  * Usage: runMain graft.examples.Q54GrowthProbe [sfDir] [target]
  */
object Q54GrowthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val target = args.lift(1).map(_.toLong).getOrElse(256L)
    val nBatches = 12
    val perBatch = 50
    val spark = graft.Engine.session()
    import graft.streaming.NearDup

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val nDocs = docs.count()

    // the ONE doc-replica staging definition (see Replicas.scala)
    def replicas(from: Int, until: Int) =
      Replicas.docReplicas(docs, nDocs)(from, until)

    val root = s"/tmp/q54probe_${ProcessHandle.current().pid()}"
    for (seedMult <- Seq(4, 8, 16); layout <- Seq("bucketed", "plain")) {
      val base = s"$root/x${seedMult}_$layout"
      val bandRoot = s"$base/band"
      val exactRoot = s"$base/exact"
      val bucketed = layout == "bucketed"
      // seed: one big batch 0 = the accumulated stream history
      NearDup.processBatch(
        replicas(0, seedMult), 0L, s"$base/res", bandRoot, exactRoot,
        targetRowsPerBucket = target, bucketed = bucketed)
      println(s"== seed=x$seedMult (${seedMult * nDocs} docs)  layout=$layout  " +
        s"target=$target rows/bucket ==")
      println(f"${"batch"}%5s ${"wall_s"}%7s ${"idx_rows"}%9s " +
        f"${"rows_read"}%9s ${"compacted"}%9s")
      for (i <- 1 to nBatches) {
        // fresh docs: replica block 100+i, sliced to perBatch
        val batch = replicas(100 + i, 101 + i)
          .filter(col("doc_id") % nDocs < perBatch)
          .localCheckpoint()
        val t0 = System.nanoTime()
        val compacted = NearDup.processBatch(
          batch, i.toLong, s"$base/res", bandRoot, exactRoot,
          targetRowsPerBucket = target, bucketed = bucketed)
        val wall = (System.nanoTime() - t0) / 1e9
        // post-hoc read-cost audit: what does a probe of THIS batch's
        // band keys read from the index as it now stands?
        val keys = graft.queries.DedupQueries
          .keyedBandsOf(batch).select(col("bk")).distinct().localCheckpoint()
        val store = NearDup.bandIndex(spark, bandRoot, target, 16)
        val (idxRows, rowsRead) =
          if (bucketed)
            (store.totalRows(), store.probe(keys).map(_.count()).getOrElse(0L))
          else {
            val n = spark.read.parquet(bandRoot).count(); (n, n)
          }
        println(f"$i%5d $wall%7.2f $idxRows%9d $rowsRead%9d " +
          f"${if (compacted) "yes" else ""}%9s")
      }
    }
    spark.stop()
  }
}
