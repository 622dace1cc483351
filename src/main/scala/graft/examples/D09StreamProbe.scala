package graft.examples

import org.apache.spark.sql.functions._

import graft.streaming.IncDedup

/** Is q58's per-batch cost FLAT as the incremental-dedup index grows —
  * i.e. did backing d09's continuous form with [[graft.streaming
  * .BucketedIndex]] actually buy the q54 property for the second
  * foreachBatch state consumer?
  *
  * Same shape as [[Q54GrowthProbe]]: seed the index at ×4/×8/×16
  * replicas of the sf corpus (the accumulated ingest history), then
  * drive 12 fresh 50-doc delta batches through
  * [[IncDedup.processBatch]] — the IDENTICAL code q58's stream runs —
  * reporting wall seconds, total index rows, and what the batch's band
  * probe reads from the index as it stands. Flat = rows_read converges
  * on the |batch keys| × occupancy asymptote down the batch column AND
  * across the seed axis while idx_rows quadruples.
  *
  * Usage: runMain graft.examples.D09StreamProbe [sfDir] [target]
  *   [seedMult...]  — extra args override the ×4/×8/×16 seed axis
  *   (round-16 verdict task 4 wants a receipt a decade beyond ×16;
  *   e.g. `… /root/testdata/sf0.1 256 16 160` seeds an 8M-doc index —
  *   past sf100's 5M docs — from the replica stager).
  */
object D09StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val target = args.lift(1).map(_.toLong).getOrElse(256L)
    val seedAxis =
      if (args.length > 2) args.drop(2).toSeq.map(_.toInt) else Seq(4, 8, 16)
    val nBatches = 12
    val perBatch = 50
    val spark = graft.Engine.session()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val nDocs = docs.count()
    // the ONE doc-replica staging definition (see Replicas.scala)
    def replicas(from: Int, until: Int) =
      Replicas.docReplicas(docs, nDocs)(from, until)

    val root = s"/tmp/d09probe_${ProcessHandle.current().pid()}"
    for (seedMult <- seedAxis) {
      val base = s"$root/x$seedMult"
      val idxRoot = s"$base/index"
      IncDedup.seedHistory(
        spark,
        graft.queries.DedupQueries.keyedBandsOf(replicas(0, seedMult)),
        idxRoot, targetRowsPerBucket = target)
      println(s"== seed=x$seedMult (${seedMult * nDocs} docs)  " +
        s"target=$target rows/bucket ==")
      println(f"${"batch"}%5s ${"wall_s"}%7s ${"idx_rows"}%9s " +
        f"${"rows_read"}%9s ${"compacted"}%9s")
      for (i <- 1 to nBatches) {
        val batch = replicas(100 + i, 101 + i)
          .filter(col("doc_id") % nDocs < perBatch)
          .localCheckpoint()
        val t0 = System.nanoTime()
        val compacted = IncDedup.processBatch(
          batch, i.toLong, s"$base/res", idxRoot,
          targetRowsPerBucket = target)
        val wall = (System.nanoTime() - t0) / 1e9
        val keys = graft.queries.DedupQueries
          .keyedBandsOf(batch).select(col("bk")).distinct().localCheckpoint()
        val ix = IncDedup.index(spark, idxRoot, target, 16)
        val (idxRows, rowsRead) =
          (ix.totalRows(), ix.probe(keys).map(_.count()).getOrElse(0L))
        println(f"$i%5d $wall%7.2f $idxRows%9d $rowsRead%9d " +
          f"${if (compacted) "yes" else ""}%9s")
      }
    }
    spark.stop()
  }
}
