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

  /** Rebalance rows across the session's shuffle-partition count before
    * a CPU-heavy per-row stage (hashing/shingling/vector math). Small
    * corpora often arrive as ONE parquet file = one partition, which
    * serializes all the expression work onto a single core (measured:
    * the whole dedup family single-threaded at sf0.1). The round-robin
    * shuffle moves only the narrow input rows and is dwarfed by the
    * per-row compute it parallelizes — the standard rebalance-before-
    * expensive-map pattern, equally valid on a cluster when upstream
    * produced few/skewed files. */
  def rebalance(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

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
      // NTZ estates (writers that stamp isAdjustedToUTC=false, e.g.
      // DuckDB COPY): interpret the wall-clock instant in the session
      // zone — UTC here, so the cast is the identity instant and every
      // unix_micros/window expression downstream keeps working.
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a timestamp (e.g. future driver fix)
    }
  }
}
