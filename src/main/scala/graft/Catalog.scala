package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: register every driver table as a temp view so
  * `spark.sql("SELECT … FROM lineitem …")` works directly — the engine
  * is DataFrame-first, but the same session serves SQL users unchanged
  * (one catalog, one planner; the custom `format5_decode` function from
  * [[graft.plans.GraftExtensions]] is available there too). */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register all tables from an sf dir as temp views (events gets the
    * nanos→micros normalization from [[Tables.events]]). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case n        => Tables.table(spark, dir, n).createOrReplaceTempView(n)
    }
}
