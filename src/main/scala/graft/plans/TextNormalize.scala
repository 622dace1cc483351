package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the first
  * pass of any text-cleaning pipeline (a corpus mixing composed `é` with
  * decomposed `e`+U+0301 breaks exact dedup, shingle hashing, and
  * tokenizer vocabularies, because the two spellings hash differently
  * while rendering identically).
  *
  * Spark ships no normalization builtin, so the alternative is a Scala
  * UDF — which serializes through `UTF8String → String → UTF8String` AND
  * blocks WholeStageCodegen around it. This expression stays inside
  * codegen like a builtin and takes two fast paths a UDF cannot express
  * declaratively:
  *
  *  - pure-ASCII input (`numBytes == numChars`) returns the INPUT
  *    reference — no String materialization at all. On real web corpora
  *    the overwhelming majority of rows take this path.
  *  - already-normalized non-ASCII (checked with
  *    `Normalizer.isNormalized`, allocation-free) also returns the input.
  *
  * Registered as SQL function `nfc_normalize` by [[GraftExtensions]] —
  * the same name DuckDB uses, which is what makes the t14 oracle an
  * engine-vs-engine check of the normalization itself.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a STRING input, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    TextNormalizeUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextNormalizeUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

/** Shared by interpreted eval and generated code (static forwarder). */
object TextNormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path: NFC is the identity on ASCII, and an all-ASCII
    // UTF-8 string is exactly one byte per codepoint.
    if (s.numBytes() == s.numChars()) return s
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }
}
