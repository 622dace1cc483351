package graft.examples

import org.apache.spark.sql.functions._

import graft.Engine
import graft.Tables

/** End-to-end corpus dedup — the flagship LLM-pipeline story as one
  * runnable: near-dup PAIRS (MinHash-LSH, the d02 shape) → duplicate
  * CLUSTERS ([[graft.ops.ConnectedComponents]]) → keep one
  * representative per cluster → write the cleaned corpus.
  *
  * Usage: `sbt "runMain graft.examples.DedupDemo [sfDir] [outDir]"`
  */
object DedupDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-dedup").toString)
    val spark = Engine.session()
    try {
      // near-dup pairs via the declared d02 query (da, db, jaccard)
      val pairs = graft.SparkEntry.queries("d02_minhash_lsh_pairs")(spark, sfDir)
      val clusters = graft.ops.ConnectedComponents.run(
        pairs.select(col("da").as("src"), col("db").as("dst")))
      // every clustered doc that is NOT its cluster's minimum id is a
      // duplicate to drop; docs in no cluster are kept untouched
      val drop = clusters
        .filter(col("v") =!= col("component"))
        .select(col("v").as("doc_id"))
      val docs = Tables.documents(spark, sfDir)
      val cleaned = docs.join(drop, Seq("doc_id"), "left_anti")
      cleaned.write.mode("overwrite").parquet(s"$outDir/documents_clean")

      val total = docs.count()
      val kept = spark.read.parquet(s"$outDir/documents_clean").count()
      println(s"[dedup-demo] $total docs -> $kept kept " +
        s"(${total - kept} near-duplicates removed) at $outDir/documents_clean")
    } finally spark.stop()
  }
}
