package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Engine semantics: UTC, AQE,
  * nanosAsLong). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = Engine.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
