package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFns._

/** Property tests for the vector primitives: generated vectors, one
  * batch DataFrame pass per property (Column functions need a session). */
class VectorFnsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val vec: Gen[Seq[Float]] =
    Gen.chooseNum(2, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f).suchThat(f => !f.isNaN)))
  private val pairs: Seq[(Seq[Float], Seq[Float])] =
    Gen.listOfN(150, vec.flatMap(a =>
      Gen.listOfN(a.size, Gen.chooseNum(-10.0f, 10.0f)).map(b => (a, b.toSeq))))(
      Gen.Parameters.default, org.scalacheck.rng.Seed(7L)).get

  private lazy val df = pairs.toDF("a", "b")
    .select(toDouble(col("a")).as("a"), toDouble(col("b")).as("b"))
    .filter(norm(col("a")) > 1e-6 && norm(col("b")) > 1e-6)
    .select(
      (dot(col("a"), col("b")) / (norm(col("a")) * norm(col("b")))).as("cosAB"),
      (dot(col("b"), col("a")) / (norm(col("b")) * norm(col("a")))).as("cosBA"),
      (dot(col("a"), col("a")) / (norm(col("a")) * norm(col("a")))).as("cosAA"),
      abs(dot(col("a"), col("b"))).as("absDot"),
      (norm(col("a")) * norm(col("b"))).as("normProd"))
    .collect()

  test("cosine: bounded, symmetric, self-similarity 1") {
    assert(df.nonEmpty)
    df.foreach { r =>
      assert(r.getDouble(0) >= -1.0 - 1e-12 && r.getDouble(0) <= 1.0 + 1e-12)
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12, "symmetry")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12, "self-similarity")
    }
  }

  test("Cauchy–Schwarz: |a·b| ≤ |a||b|") {
    df.foreach(r => assert(r.getDouble(3) <= r.getDouble(4) * (1 + 1e-12)))
  }

  test("srpBucket is a fixed-width sign pattern") {
    val rows = pairs.toDF("a", "b")
      .select(srpBucket(toDouble(col("a")), 4).as("bkt"))
      .collect()
    rows.foreach(r => assert(r.getString(0).matches("[01]{4}")))
  }
}
