package graft.examples

import org.apache.spark.sql.functions._

import graft.streaming.Decontam

/** Is q61's per-batch cost FLAT — in stream age (the index is static,
  * so it must be) AND in benchmark-index size (the probe prunes to the
  * batch's own buckets, so rows_read should scale with |batch grams| ×
  * occupancy, not |index|)?
  *
  * Same shape as [[D09StreamProbe]]: seed the benchmark-gram index at
  * ×1/×4/×16 replicas of the sf benchmark slice, then drive 12 fresh
  * 50-doc train batches through [[Decontam.processBatch]] — the
  * IDENTICAL code q61's stream runs — reporting wall seconds, total
  * index rows, and what the batch's probe reads from the index. The
  * verdict-task receipt: wall flat down the batch column at every
  * seed, rows_read growing far sub-linearly across the ×16 seed axis.
  *
  * The seed axis SALTS the replicated benchmark grams
  * (`xxhash64(h, rep)` over the BIGINT gram tokens — kept in step
  * with p04's xxhash64 gram spelling) — text replicas share almost
  * every gram, so
  * without the salt a ×16 "growth" grows the distinct-gram index ~30%
  * and proves nothing. The batch size is a parameter because the
  * pruning receipt needs |batch grams| ≪ bucket count (a 50-doc batch
  * carries ~5k distinct grams and touches every bucket of a toy index;
  * production benchmark indexes carry 10⁶–10⁹ grams across 10³–10⁵
  * buckets probed by per-batch key sets that touch a sliver).
  *
  * Usage: runMain graft.examples.DecontamStreamProbe
  *   [sfDir] [target] [perBatch] [seedMult...]  — extra args override
  *   the ×1/×4/×16 seed axis (round-16 verdict task 4: one receipt a
  *   decade beyond ×16, e.g. `… 4096 50 16 160`).
  */
object DecontamStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val target = args.lift(1).map(_.toLong).getOrElse(4096L)
    val perBatch = args.lift(2).map(_.toInt).getOrElse(50)
    val seedAxis =
      if (args.length > 3) args.drop(3).toSeq.map(_.toInt) else Seq(1, 4, 16)
    val nBatches = 12
    val spark = graft.Engine.session()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text")).localCheckpoint()
    val nDocs = docs.count()
    // docReplicas carries (doc_id, text); the lang column rides back in
    // via the original id (replica id mod nDocs), broadcast dim-style
    def replicas(from: Int, until: Int) =
      Replicas.docReplicas(docs.select(col("doc_id"), col("text")), nDocs)(
          from, until)
        .withColumn("ok", pmod(col("doc_id"), lit(nDocs)))
        .join(broadcast(docs.select(col("doc_id").as("ok"), col("lang"))), "ok")
        .drop("ok")

    val bench = docs
      .filter(graft.queries.AnalyticsQueries.isBenchDoc(col("doc_id")))
    val benchGrams = Decontam.benchHashesOf(bench).localCheckpoint()

    val root = s"/tmp/q61probe_${ProcessHandle.current().pid()}"
    for (seedMult <- seedAxis) {
      val base = s"$root/x$seedMult"
      val idxRoot = s"$base/index"
      // rep 0 keeps the REAL grams (so batches still hit); reps ≥ 1 are
      // salted — a genuinely ×seedMult distinct-gram index
      val seeded = benchGrams.crossJoin(
          spark.range(seedMult).select(col("id").as("rep")))
        .select(when(col("rep") === 0, col("h"))
          .otherwise(xxhash64(col("h"), col("rep"))).as("h"))
      val ix = Decontam.index(spark, idxRoot, target, 16)
      if (!ix.exists) {
        ix.append(seeded.localCheckpoint())
        ix.compact()
      }
      println(s"== seed=x$seedMult bench grams=${ix.totalRows()} " +
        s"target=$target rows/bucket perBatch=$perBatch docs ==")
      println(f"${"batch"}%5s ${"wall_s"}%7s ${"rows_read"}%9s")
      for (i <- 1 to nBatches) {
        val batch = replicas(100 + i, 101 + i)
          .filter(!graft.queries.AnalyticsQueries.isBenchDoc(col("doc_id")))
          .filter(col("doc_id") % nDocs < perBatch)
          .localCheckpoint()
        val t0 = System.nanoTime()
        Decontam.processBatch(batch, i.toLong, s"$base/res", idxRoot,
          targetRowsPerBucket = target)
        val wall = (System.nanoTime() - t0) / 1e9
        val keys = Decontam.benchHashesOf(batch).localCheckpoint()
        val rowsRead = ix.probe(keys).map(_.count()).getOrElse(0L)
        println(f"$i%5d $wall%7.2f $rowsRead%9d")
      }
    }
    spark.stop()
  }
}
