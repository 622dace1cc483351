package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFns

/** The native `vector_dot` expression ([[graft.plans.VectorDot]]) must be
  * bit-identical to the composed-builtin fold it replaces — the oracle
  * parity of every similarity query rides on that equality. */
class VectorDotSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val vec = Gen.chooseNum(1, 64).flatMap(n =>
    Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3).map(x => math.round(x * 1000) / 1000.0)))
  private val pairs: Seq[(Seq[Double], Seq[Double])] =
    Gen.listOfN(200, for { a <- vec } yield (a, a.map(_ * 0.37 + 0.11)))(
      Gen.Parameters.default, org.scalacheck.rng.Seed(7L)).get

  test("native loop ≡ composed zip_with/aggregate fold, bit for bit") {
    val rows = pairs.toDF("a", "b")
      .select(
        VectorFns.dot(col("a"), col("b")).as("native"),
        VectorFns.dotFold(col("a"), col("b")).as("composed"))
      .collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("norm ≡ sqrt of self-dot, and cosine of a vector with itself is 1") {
    val rows = pairs.take(50).map(_._1).toDF("v")
      // a zero vector has no direction: cosine would divide by zero
      // (ANSI) — callers guard exactly like this
      .filter(VectorFns.dot(col("v"), col("v")) > 0)
      .select(
        VectorFns.norm(col("v")).as("n"),
        VectorFns.cosine(col("v"), col("v")).as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    }
  }

  test("null semantics: length mismatch and NULL element both poison to NULL") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),          // length mismatch
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),    // null element
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)))     // clean
      .toDF("a", "b")
      .select(VectorFns.dot(col("a"), col("b")).as("d"))
      .collect()
    assert(df(0).isNullAt(0), "length mismatch → NULL")
    assert(df(1).isNullAt(0), "NULL element → NULL")
    assert(df(2).getDouble(0) == 11.0)
  }

  test("vector_dot is callable from SQL (extension registration)") {
    val r = spark.sql("SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }
}
