package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.TextNormalizeUtil

/** `nfc_normalize` — the native NFC expression: composition semantics
  * match `java.text.Normalizer` (the JDK's Unicode reference impl), the
  * ASCII fast path returns the input reference, and NULL propagates.
  * All non-ASCII content is spelled with \u escapes — raw codepoints in
  * source would leave the composed-vs-decomposed distinction to the
  * editor's whim, which is exactly what this expression erases. */
class TextNormalizeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val EAcute = "\u00e9"
  private val EDeco = "e\u0301"
  private val ODeco = "o\u0308"

  test("decomposed sequences compose; composed & ASCII are unchanged") {
    val rows = Seq(
      ("deco_acute", "caf" + EDeco),
      ("deco_uml", "t" + ODeco + "ne"),
      ("composed", "caf" + EAcute),
      ("ascii", "plain ascii"),
      ("mixed", "a\u0301b c\u0327 done"))
      .toDF("label", "s")
    val out = rows
      .select(col("label"), expr("nfc_normalize(s)").as("n"), col("s"))
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(out("deco_acute")._1 == "caf" + EAcute)
    assert(out("deco_uml")._1 == "t\u00f6ne")
    assert(out("composed")._1 == "caf" + EAcute)
    assert(out("ascii")._1 == "plain ascii")
    assert(out("mixed")._1 == "\u00e1b \u00e7 done")
    // composition shortens: the composed pair loses one codepoint
    assert(out("deco_acute")._1.length == out("deco_acute")._2.length - 1)
  }

  test("util fast paths return the input reference; NULL propagates") {
    val ascii = UTF8String.fromString("only ascii here")
    assert(TextNormalizeUtil.nfc(ascii) eq ascii)
    val composed = UTF8String.fromString("caf" + EAcute)
    assert(TextNormalizeUtil.nfc(composed) eq composed)
    assert(TextNormalizeUtil.nfc(UTF8String.fromString(EDeco)).toString == EAcute)
    val nulls = Seq(Tuple1(null: String)).toDF("s")
      .select(expr("nfc_normalize(s)").as("n")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("expression stays inside WholeStageCodegen") {
    // spark.range (not a local Seq): a LocalTableScan would constant-fold
    // the whole projection away and prove nothing about codegen.
    val df = spark.range(4)
      .select(expr("nfc_normalize(concat(cast(id AS string), 'a\\u0301'))").as("n"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.collect().forall(_.getString(0).endsWith("\u00e1")))
  }
}
