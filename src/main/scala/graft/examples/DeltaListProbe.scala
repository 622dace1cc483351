package graft.examples

import org.apache.spark.sql.functions._

import graft.Engine

/** Round-13 seed 3: base generations answer cold starts from their
  * `_MANIFEST`, but DELTA generations re-list their directory on every
  * probe — unmeasured at high batch counts. A high-throughput stream
  * can accumulate hundreds of per-batch delta files between size-ratio
  * folds; if probe cost grows with the delta FILE COUNT (listing +
  * footer reads), the fix is per-batch manifest entries (or in-session
  * status caching). This probe measures exactly that axis: ONE base,
  * then N un-folded appends of a FIXED total row mass (so data volume
  * is constant and only the file count varies), probing after each
  * doubling.
  *
  * Run: `sbt "runMain graft.examples.DeltaListProbe"` — prints
  * (delta_files, probe_sec) rows; flat = nothing to fix, growing =
  * implement the delta manifest.
  */
object DeltaListProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files
      .createTempDirectory("graft_deltalist").toString + "/idx"
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, k STRING")
    val ix = new graft.streaming.BucketedIndex(
      spark, root, "k", schema, targetRowsPerBucket = 4096L, minBuckets = 16)

    def rows(a: Long, b: Long) = spark.range(a, b)
      .select(col("id").as("doc_id"),
        concat(lit("key"), pmod(col("id"), lit(1024L))).as("k"))

    ix.append(rows(0L, 262144L).localCheckpoint())
    ix.compact() // the base; everything after stays un-folded delta

    val keys = rows(0L, 512L).select("k").distinct().localCheckpoint()
    def probeSec(): Double = {
      val t0 = System.nanoTime()
      ix.probe(keys).get.groupBy("k").count()
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // fixed delta mass (~16k rows) split into n files: only the file
    // count varies across checkpoints
    var appended = 0
    var nextId = 1000000L
    println(f"${0}%5d files  warm=${math.min(probeSec(), probeSec())}%6.2f s")
    for (target <- Seq(16, 64, 256)) {
      val per = math.max(1, 16384 / target)
      while (appended < target) {
        ix.append(rows(nextId, nextId + per).localCheckpoint())
        nextId += per
        appended += 1
      }
      println(f"$appended%5d files  warm=${math.min(probeSec(), probeSec())}%6.2f s")
    }
    spark.stop()
  }
}
