package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Histogram of the 16 hex-nibble classes of a string, in ONE pass —
  * the counting kernel of the byte-entropy triage (m07).
  *
  * The composed form is 16 separate
  * `length(hx) - length(translate(hx, d, ''))` terms: 16 full scans of
  * the string per row, each `translate` allocating a fresh UTF8String,
  * and the 16-term projection emitting a generated method big enough
  * to sit at the JIT's compilation threshold — measured on the full
  * 204-query bench run, that projection intermittently fell out of
  * compiled code late in the run (code-cache pressure) and the same
  * query swung 2.7 s → 5.8–67 s. This expression replaces all 16 terms
  * with one allocation-free byte loop small enough that neither the
  * JIT threshold nor the translate allocations exist to regress.
  *
  * Semantics: element i of the result (1-indexed `element_at` position
  * i+1) is the count of hex digit i (`0`–`9`, `A`–`F`), counting BOTH
  * cases — so the caller needs no `upper()` pass. Non-hex bytes are
  * ignored (count toward no class), matching the composed form on the
  * pure-hex strings it was built for. NULL in → NULL out. Counts are
  * exact integers, so swapping the composed form for this one changes
  * no downstream float arithmetic — [[graft.NibbleCountsSpec]] pins
  * equality against the translate form on real payload hex.
  *
  * Registered as SQL function `nibble_counts` by [[GraftExtensions]].
  */
case class NibbleCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nibble_counts requires a STRING input, got ${child.dataType.sql}")

  override def nullable: Boolean = child.nullable

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    NibbleCountsUtil.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.NibbleCountsUtil.count($s);")

  override protected def withNewChildInternal(newChild: Expression): NibbleCounts =
    copy(child = newChild)

  override def prettyName: String = "nibble_counts"
}

/** Loop shared by interpreted eval and generated code. */
object NibbleCountsUtil {
  def count(s: UTF8String): ArrayData = {
    val counts = new Array[Int](16)
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= '0' && b <= '9') counts(b - '0') += 1
      else if (b >= 'A' && b <= 'F') counts(b - 'A' + 10) += 1
      else if (b >= 'a' && b <= 'f') counts(b - 'a' + 10) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }
}
