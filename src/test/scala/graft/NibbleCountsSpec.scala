package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The native `nibble_counts` expression ([[graft.plans.NibbleCounts]])
  * must equal the 16-term length-translate histogram it replaced — m07's
  * oracle parity rides on the counts being exact-integer identical
  * (the downstream entropy floats are then bit-unchanged). */
class NibbleCountsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def translateCounts(c: org.apache.spark.sql.Column) =
    "0123456789ABCDEF".map(d =>
      length(upper(c)) - length(translate(upper(c), d.toString, "")))

  test("one-pass histogram ≡ 16 length-translate terms on generated hex") {
    val hex = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("0123456789abcdefABCDEF".toSeq)).map(_.mkString))
    val strs = Gen.listOfN(300, hex)(
      Gen.Parameters.default, org.scalacheck.rng.Seed(13L)).get
    import spark.implicits._
    val df = strs.toDF("hx")
    val rows = df.select(
      call_function("nibble_counts", col("hx")).as("native"),
      array(translateCounts(col("hx")): _*).as("composed")).collect()
    assert(rows.length == 300)
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1), s"mismatch on row $r")
    }
  }

  test("edge cases: empty, non-hex bytes ignored, NULL in → NULL out") {
    import spark.implicits._
    val df = Seq[Option[String]](
      Some(""), Some("zz =-!@"), Some("0f0F"), None).toDF("hx")
    val rows = df.select(call_function("nibble_counts", col("hx")).as("nc"))
      .collect()
    assert(rows(0).getSeq[Int](0) == Seq.fill(16)(0))
    assert(rows(1).getSeq[Int](0) == Seq.fill(16)(0))
    val c = rows(2).getSeq[Int](0)
    assert(c(0) == 2 && c(15) == 2 && c.sum == 4)
    assert(rows(3).isNullAt(0))
  }

  test("m07 wiring: whole-stage codegen keeps the expression compiled") {
    // The reason this expression exists — the translate form fell out of
    // compiled code under code-cache pressure. Assert the plan stays
    // inside WholeStageCodegen (the expression generates via doGenCode,
    // not fallback eval).
    val plan = spark.range(4)
      .select(call_function("nibble_counts", hex(col("id"))).as("nc"))
      .queryExecution.executedPlan.toString
    // `*(n)` is WholeStageCodegen's marker in the simple plan string —
    // the Project carrying nibble_counts must sit inside a codegen span.
    assert(plan.contains("*(1) Project [nibble_counts"), plan)
  }
}
