package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Pipeline
import graft.functions.Format5

/** Source-format interchange for the readings contract: the same
  * pipeline result must come back whether readings arrive as parquet,
  * JSON, or CSV. Binary payloads ride text formats hex-encoded (the
  * on-the-wire convention a collector would use); the decode-side
  * `unhex` restores `BinaryType` before the pipeline sees it. */
class FormatsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val tagDim = Seq(("AA:BB:CC:DD:EE:01", "Kitchen")).toDF("mac", "name")

  private def baseReadings: DataFrame =
    Seq(
      ("AA:BB:CC:DD:EE:01", Timestamp.valueOf("2024-01-01 10:00:00"), 4000L, 1L),
      ("AA:BB:CC:DD:EE:01", Timestamp.valueOf("2024-01-01 10:10:00"), 5000L, 2L))
      .toDF("mac", "ts", "t", "m")
      .select(col("mac"), col("ts"),
        unhex(Format5.encodeHex(col("t"), lit(20000L), lit(50000L),
          lit(0L), lit(0L), lit(1000L), col("m"))).as("payload"))

  private def run(readings: DataFrame): Seq[String] =
    Pipeline.batch(readings, tagDim)
      .orderBy("mac", "time")
      .collect()
      .map(_.toString)
      .toSeq

  test("readings round-trip parquet ≡ json ≡ csv through the pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft-formats").toString
    val expected = run(baseReadings)
    assert(expected.nonEmpty)

    // parquet: binary column natively
    baseReadings.write.parquet(s"$dir/pq")
    assert(run(spark.read.parquet(s"$dir/pq")) == expected)

    // JSON + CSV: hex-encode the payload for the text wire format
    val asText = baseReadings.select(col("mac"), col("ts"), hex(col("payload")).as("payload_hex"))
    asText.write.json(s"$dir/js")
    val fromJson = spark.read
      .schema("mac STRING, ts TIMESTAMP, payload_hex STRING")
      .json(s"$dir/js")
      .select(col("mac"), col("ts"), unhex(col("payload_hex")).as("payload"))
    assert(run(fromJson) == expected)

    asText.write.option("header", "true").csv(s"$dir/csv")
    val fromCsv = spark.read
      .schema("mac STRING, ts TIMESTAMP, payload_hex STRING")
      .option("header", "true")
      .csv(s"$dir/csv")
      .select(col("mac"), col("ts"), unhex(col("payload_hex")).as("payload"))
    assert(run(fromCsv) == expected)
  }
}
