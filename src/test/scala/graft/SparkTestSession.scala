package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Engine semantics: UTC, AQE,
  * nanosAsLong). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = Engine.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
