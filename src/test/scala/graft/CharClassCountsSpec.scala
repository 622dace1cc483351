package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The native `char_class_counts` expression
  * ([[graft.plans.CharClassCounts]]) must equal the per-character
  * length-replace histogram it replaced — t13's oracle parity rides on
  * the counts being exact-integer identical. The multibyte case is the
  * load-bearing one: ASCII targets counted at the BYTE level of UTF-8
  * text must still equal the replace-form's CHARACTER counts. */
class CharClassCountsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val alphabet = ('a' to 'z').mkString + " "

  private def composed(c: org.apache.spark.sql.Column) =
    array(alphabet.map(ch =>
      length(c) - length(replace(c, lit(ch.toString), lit("")))): _*)

  test("one-pass histogram ≡ per-char length-replace terms, multibyte included") {
    val chars = Gen.frequency(
      (8, Gen.alphaChar), (2, Gen.oneOf(" .!?,;:'\"-".toSeq)),
      (2, Gen.oneOf("äöüßéàç漢字🙂".toSeq))) // multibyte: must not disturb counts
    val text = Gen.chooseNum(0, 80).flatMap(n => Gen.listOfN(n, chars).map(_.mkString))
    val strs = Gen.listOfN(300, text)(
      Gen.Parameters.default, org.scalacheck.rng.Seed(29L)).get
    import spark.implicits._
    val rows = strs.toDF("t").select(
      call_function("char_class_counts", lower(col("t")), lit(alphabet)).as("native"),
      composed(lower(col("t"))).as("composed")).collect()
    assert(rows.length == 300)
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1), s"mismatch on $r")
    }
  }

  test("edge cases: empty text, NULL text, duplicate alphabet slot") {
    import spark.implicits._
    val rows = Seq(Some(""), None).toDF("t")
      .select(call_function("char_class_counts", col("t"), lit("ab")).as("cc"))
      .collect()
    assert(rows(0).getSeq[Int](0) == Seq(0, 0))
    assert(rows(1).isNullAt(0))
    // duplicate alphabet char counts into its FIRST slot
    val dup = spark.range(1)
      .select(call_function("char_class_counts",
        concat(lit("aaa"), hex(col("id") * 0)).as("t"), lit("aa")).as("cc"))
      .collect()(0).getSeq[Int](0)
    assert(dup(0) == 3 && dup(1) == 0)
  }

  test("non-ASCII alphabet is rejected at analysis time") {
    val e = intercept[Exception] {
      spark.range(1)
        .select(call_function("char_class_counts", lit("x"), lit("aä")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("ascii"), e.getMessage)
  }

  test("t13 wiring: the expression stays inside whole-stage codegen") {
    val plan = spark.range(4)
      .select(call_function("char_class_counts", hex(col("id")), lit("abc")).as("cc"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [char_class_counts"), plan)
  }
}
