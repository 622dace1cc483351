package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest layout utilities — the storage half of the 100 TB design.
  *
  * The engine's queries are declarative, so the *only* thing that changes
  * between sf0.01 and 100 TB is how the data is laid out at rest:
  *
  *  - **Bucketing** fact tables by their join key makes fact⋈fact joins
  *    exchange-free: both sides arrive hash-partitioned by the bucket
  *    key, so EnsureRequirements inserts no shuffle. At 100 TB the
  *    orders⋈lineitem edge (TPC-H Q3 / q13) is THE dominant shuffle;
  *    bucketing both by orderkey removes it entirely. (The reference has
  *    no analogous concept — its "table" is an in-memory HashMap,
  *    `/root/reference/src/main.rs:72`.)
  *
  *  - **Partitioning** an event table by day turns every time-bounded
  *    query (the 30-min windows of OP-08 over any bounded range) into a
  *    partition-pruned scan: the filter is resolved against directory
  *    names, and unneeded days are never opened.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed parquet table. Joins and
    * aggregations keyed on `key` against other tables bucketed the same
    * way (same key, same bucket count) plan without a shuffle. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Write an event table partitioned by the date of `tsCol` — queries
    * filtering on `p_date` scan only the matching directories. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write
      .partitionBy("p_date")
      .mode("overwrite")
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write `df` range-clustered on `key`: rows are range-partitioned
    * into `files` output files and sorted within each, so every file
    * covers one narrow, non-overlapping key range. Parquet records
    * per-column min/max in footers and row groups; a point or range
    * predicate on `key` then skips every non-overlapping file/row-group
    * at scan time — directory-free data skipping, the complement of
    * [[writeDatePartitioned]] for high-cardinality keys where one
    * directory per value is unworkable. (The same idea generalizes to
    * multi-column Z-ordering; one clustered column covers the dominant
    * predicate.) */
  def writeRangeClustered(df: DataFrame, key: String, files: Int, path: String): Unit =
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(key)
      .write
      .mode("overwrite")
      .parquet(path)

  /** Compact a small-files directory into size-targeted files — the
    * maintenance pass every long-lived 100 TB table needs: streaming
    * sinks and fine-grained partition writes accrete thousands of tiny
    * files, and each one costs a task launch, a footer read, and a
    * metastore entry on every subsequent scan. Sizing from the ACTUAL
    * bytes on disk (not a guessed file count) keeps the output at
    * `targetBytes` per file as the input grows. The rewrite goes
    * through a staging directory and a rename, so a reader never sees
    * a half-compacted table, and the source is only replaced after the
    * staged write succeeded.
    *
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String, targetBytes: Long = 128L << 20): (Int, Int) = {
    import java.nio.file.{Files, Path, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    def parquetFiles(p: Path): Seq[Path] = {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq.filter(_.getFileName.toString.endsWith(".parquet"))
      finally s.close() // Files.list leaks the directory fd unless closed
    }
    val dir = Paths.get(path)
    val before = parquetFiles(dir)
    val totalBytes = before.map(Files.size).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val staging = Paths.get(path + ".compact-staging")
    spark.read.parquet(path).repartition(nOut).write.mode("overwrite")
      .parquet(staging.toString)
    // replace source only after the staged write fully succeeded
    val old = Paths.get(path + ".compact-old")
    Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, dir, StandardCopyOption.ATOMIC_MOVE)
    val walk = Files.walk(old)
    try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
    finally walk.close()
    (before.size, parquetFiles(dir).size)
  }
}
