package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet tables (`/root/repo/TESTDATA.md`).
  *
  * All loads are plain `spark.read.parquet` so Catalyst's column pruning and
  * filter pushdown reach the scan (check `PushedFilters`/`ReadSchema` in
  * `.explain("formatted")`). Nothing here collects to the driver.
  *
  * At the 100 TB design point these tables would be partitioned/bucketed at
  * rest (e.g. `lineitem` bucketed by `l_orderkey`, `events` partitioned by
  * day of `ts`); the loaders stay the same — partition pruning then falls
  * out of the same declarative filters.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` carries a `timestamp[ns]` column. Spark's reader rejects
    * TIMESTAMP(NANOS); with `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set by [[Engine]]) it arrives as a long of epoch-nanos. DuckDB — the
    * correctness oracle — reads the same column as its µs `TIMESTAMP`,
    * truncating. `ts div 1000` is integer division (no double rounding at
    * 1e18 magnitudes), so both engines see the identical µs instant.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw // already a timestamp (e.g. future driver fix)
    }
  }
}
