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
}
