package graft.examples

import org.apache.spark.sql.functions._

import graft.streaming.AnnStream

/** Is q60's per-batch cost FLAT as the streaming ANN index grows — the
  * q54/D09Stream growth question asked of the third BucketedIndex
  * consumer. Seeds the index at ×4/×8/×16 replicas of the sf
  * embeddings (each replica a stride-rotated 50/50 MIX of two base
  * vectors — the Sf1Stage trick, so replicas are genuinely new points
  * and buckets don't pile up on coincident vectors), then drives 12
  * fresh 50-vector batches through the IDENTICAL
  * [[AnnStream.processBatch]] the stream runs. Flat = wall ~constant
  * down the batch column AND across the seed axis while idx_rows
  * quadruples; rows_read = what the batch's bucket probe reads from
  * the index as it stands.
  *
  * Reading note (first run, adaptive bits=4 at these corpus sizes):
  * wall is FLAT across the ×4 seed axis, but a 50-vector batch touches
  * nearly all 2⁴=16 buckets, so rows_read ≈ the index — pruning only
  * bites when |batch keys| ≪ 2^bits. The [bits] override (default the
  * adaptive rule at ×16) shows the deployment regime: at bits=8 the
  * same batches read ~a fifth of the index, and at production widths
  * (corpus count drives bits up through the SAME rule) the ratio keeps
  * falling — the flat-wall property is the load-bearing claim at probe
  * scale, the prune ratio is the one that improves with N.
  *
  * Usage: runMain graft.examples.AnnStreamProbe [sfDir] [target] [bits]
  */
object AnnStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val target = args.lift(1).map(_.toLong).getOrElse(256L)
    val bitsOverride = args.lift(2).map(_.toInt)
    val nBatches = 12
    val perBatch = 50
    val spark = graft.Engine.session()

    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val nVecs = vecs.count()
    // vector-mix replica — the Sf1Stage trick (see Replicas.scala's
    // note: the two sites differ in projection, label carried there)
    val partner = vecs.select(
      col("vec_id").as("pid"), col("embedding").as("pe"))
    def replicas(from: Int, until: Int) = (from until until).map { r =>
      vecs
        .withColumn("pid", (col("vec_id") + lit(1L + 37L * r)) % lit(nVecs))
        .join(partner, "pid")
        .select(
          (col("vec_id") + lit(r * nVecs)).as("vec_id"),
          (if (r == 0) col("embedding")
           else zip_with(col("embedding"), col("pe"),
             (a, b) => (a + b) * lit(0.5f))).as("embedding"))
    }.reduce(_ unionByName _)

    // width sized once for the LARGEST seed, as an indexing job would
    val bits = bitsOverride.getOrElse(
      graft.functions.VectorFns.adaptiveSrpBits(
        16 * nVecs, graft.sources.VectorIndex.IndexBucketTarget))
    val root = s"/tmp/q60probe_${ProcessHandle.current().pid()}"
    for (seedMult <- Seq(4, 8, 16)) {
      val base = s"$root/x$seedMult"
      val idxRoot = s"$base/index"
      AnnStream.seedHistory(spark, replicas(0, seedMult), idxRoot, bits,
        targetRowsPerBucket = target)
      println(s"== seed=x$seedMult (${seedMult * nVecs} vectors)  bits=$bits  " +
        s"target=$target rows/bucket ==")
      println(f"${"batch"}%5s ${"wall_s"}%7s ${"idx_rows"}%9s " +
        f"${"rows_read"}%9s ${"compacted"}%9s")
      for (i <- 1 to nBatches) {
        val batch = replicas(100 + i, 101 + i)
          .filter(col("vec_id") % nVecs < perBatch)
          .localCheckpoint()
        val t0 = System.nanoTime()
        val compacted = AnnStream.processBatch(
          batch, i.toLong, s"$base/res", idxRoot, bits,
          targetRowsPerBucket = target)
        val wall = (System.nanoTime() - t0) / 1e9
        val keys = AnnStream.keyed(batch, bits)
          .select(col("bk")).distinct().localCheckpoint()
        val ix = AnnStream.index(spark, idxRoot, target, 16)
        val (idxRows, rowsRead) =
          (ix.totalRows(), ix.probe(keys).map(_.count()).getOrElse(0L))
        println(f"$i%5d $wall%7.2f $idxRows%9d $rowsRead%9d " +
          f"${if (compacted) "yes" else ""}%9s")
      }
    }
    spark.stop()
  }
}
