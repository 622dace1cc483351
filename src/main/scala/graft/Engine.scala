package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine.
  *
  * Every session the engine creates goes through here so that batch jobs,
  * the verify/bench mains, and the test suites agree on the semantics that
  * matter for oracle parity and scale:
  *
  *  - `spark.sql.session.timeZone=UTC` — the reference stamps aggregates in
  *    UTC (`/root/reference/src/utils.rs:82`); the DuckDB oracle also runs
  *    in UTC.
  *  - `spark.sql.legacy.parquet.nanosAsLong=true` — the driver's
  *    `events.parquet` carries `timestamp[ns]`, which Spark's Parquet reader
  *    otherwise rejects (PARQUET_TYPE_ILLEGAL). We read nanos as a long and
  *    convert with integer division (see [[Tables.events]]), matching
  *    DuckDB's own ns→µs truncation.
  *  - AQE on — at the 100 TB design point, runtime coalescing, skew-join
  *    splitting and dynamic join-strategy switching are the difference
  *    between a plan that survives and one that doesn't. Locally it also
  *    keeps the tiny SFs from producing thousands of empty tasks.
  *  - shuffle partitions default to the local core count (32), not 200 —
  *    on a real cluster this is the one knob that must be re-tuned
  *    (rule of thumb: 2–3× total executor cores, or rely on AQE's
  *    coalescing from a higher initial number).
  */
object Engine {
  def defaultParallelism: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft-engine")
      // SPARK_GRAFT_SHUFFLE_PARTITIONS decouples shuffle WIDTH from
      // local thread count — the knob a cluster sizes by data volume
      // but local[32] otherwise holds constant across decade steps
      // (the round-13 suspicion for p06/d13/g04's super-linear
      // wall-clock: fixed 32-way shuffles spilling at ×100 data). AQE
      // coalesces unused width away, so oversizing is cheap.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          shufflePartitions.toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.parquet.filterPushdown", "true")
      // NOTE: do NOT swap fs.file.impl to RawLocalFileSystem to skip the
      // .crc sidecars (tempting for micro-batch small-file overhead) —
      // the RocksDB state store used by transformWithState casts the
      // local filesystem to o.a.h.fs.LocalFileSystem and crashes every
      // TWS checkpoint commit (measured: ~5% bench win, five failed
      // streaming suites).
      .config("spark.ui.enabled", "false")

  /** Local session sized from SPARK_GRAFT_CPUS (driver contract). */
  def session(): SparkSession = {
    val cpus = defaultParallelism
    val spark = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
