package graft.examples

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.streaming.{BucketedIndex, NearDup}

/** Is the q54 index's COLD START flat in index age now that folds
  * persist a `_MANIFEST`?
  *
  * The round-12 growth probe left exactly one growing number in the
  * q54 story: batch 1 of each fresh session paid the partition
  * discovery listing over the base generation's P bucket directories —
  * 6.8/9.6/19.8 s across the ×4/×8/×16 seed axis (PLANS.md), linear in
  * P because re-bucketing keeps occupancy (not bucket count) constant.
  * [[BucketedIndex.compact]] now writes the generation's file manifest
  * at fold time and a fresh session rebuilds the relation from that ONE
  * small file ([[BucketedIndex.readManifest]] → seeded status cache →
  * zero listing). This probe drives the IDENTICAL batch step
  * ([[NearDup.processBatch]]) three ways per seed size:
  *
  *   - `cold+manifest` — caches dropped (a fresh session), manifest
  *     present: the shipped path;
  *   - `warm`          — caches primed: the steady-state floor;
  *   - `cold+listing`  — caches dropped AND manifests deleted: the
  *     round-12 behavior, kept measurable as the A/B contrast.
  *
  * Done = the cold+manifest column flat across ×4/×8/×16 (at the warm
  * floor), while cold+listing reproduces the growing cost.
  *
  * Usage: runMain graft.examples.ColdStartProbe [sfDir] [target]
  */
object ColdStartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val target = args.lift(1).map(_.toLong).getOrElse(256L)
    val perBatch = 50
    val spark = graft.Engine.session()
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val nDocs = docs.count()
    // the ONE doc-replica staging definition (see Replicas.scala)
    def replicas(from: Int, until: Int) =
      Replicas.docReplicas(docs, nDocs)(from, until)

    val root = s"/tmp/q54cold_${ProcessHandle.current().pid()}"
    println(f"${"seed"}%5s ${"buckets"}%8s ${"cold+manifest_s"}%16s " +
      f"${"warm_s"}%7s ${"cold+listing_s"}%15s")
    for (seedMult <- Seq(4, 8, 16)) {
      val base = s"$root/x$seedMult"
      val (bandRoot, exactRoot) = (s"$base/band", s"$base/exact")
      NearDup.processBatch(
        replicas(0, seedMult), 0L, s"$base/res", bandRoot, exactRoot,
        targetRowsPerBucket = target)
      // bucket count of the band base generation (the P the old
      // listing job scaled with)
      val buckets = fs.listStatus(new Path(bandRoot)).toSeq
        .filter(_.getPath.getName.endsWith("_b"))
        .map(g => fs.listStatus(g.getPath).count(_.getPath.getName.startsWith("bp=")))
        .sum

      def oneBatch(block: Int): Double = {
        val batch = replicas(block, block + 1)
          .filter(col("doc_id") % nDocs < perBatch).localCheckpoint()
        val t0 = System.nanoTime()
        NearDup.processBatch(batch, block.toLong, s"$base/res",
          bandRoot, exactRoot, targetRowsPerBucket = target)
        (System.nanoTime() - t0) / 1e9
      }

      BucketedIndex.clearCachesForTesting()
      val coldManifest = oneBatch(101)
      val warm = oneBatch(102)
      // strip the manifests → the pre-round-13 cold path
      for (r <- Seq(bandRoot, exactRoot);
           st <- fs.listStatus(new Path(r)) if st.getPath.getName.endsWith("_b"))
        fs.delete(new Path(st.getPath, "_MANIFEST"), false)
      BucketedIndex.clearCachesForTesting()
      val coldListing = oneBatch(103)
      println(f"x$seedMult%4d $buckets%8d $coldManifest%16.2f $warm%7.2f " +
        f"$coldListing%15.2f")
    }
    spark.stop()
  }
}
