package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one declared operator from SURVEY §2; the
  * matching [[oracleSql]] is the DuckDB-equivalent SQL the driver verifies
  * against at sf0.01. Queries without an oracle (non-SQL-expressible, e.g.
  * mapPartitions feature extraction) get the driver's rows-only check.
  */
object SparkEntry {

  /** The full declared inventory. */
  val inventory: Seq[QueryDef] =
    Core.defs ++ SqlQueries.defs ++ DedupQueries.defs ++ TextQueries.defs ++
      ChunkQueries.defs ++ VectorQueries.defs ++ MultimodalQueries.defs ++
      AnalyticsQueries.defs ++ GraphQueries.defs ++ FormatQueries.defs ++
      TypedQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape (SURVEY §7 step 1) — scan → filter-free groupBy →
    * round(avg)/sum/count → sort; runs on any driver-created session (no
    * session-config dependencies: lineitem has no nano-timestamps). */
  def entry(spark: SparkSession): DataFrame =
    inventory.find(_.name == "q04_group_avg").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
