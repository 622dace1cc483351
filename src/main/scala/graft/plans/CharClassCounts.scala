package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-character occurrence counts of an ASCII alphabet in a string, in
  * ONE pass — the generalized counting kernel behind the character
  * entropy query (t13; [[NibbleCounts]] is the fixed-alphabet hex
  * sibling).
  *
  * The composed form is one `length(s) - length(replace(s, ch, ''))`
  * pair PER alphabet character — t13's 27-char alphabet referenced
  * twice put ~54 full-string scan+allocate subtrees into a single
  * fused projection, the exact shape whose JIT fragility the m07
  * investigation measured (a projection that big sits at the compile
  * threshold and intermittently runs interpreted under code-cache
  * pressure late in a long session). This expression is a single
  * byte loop over a per-thread-cached 128-slot dispatch table — the
  * only per-row allocation is the result array.
  *
  * Semantics: element i (1-indexed `element_at` position i+1) is the
  * number of occurrences of `alphabet`'s i-th character in `s`. The
  * alphabet must be PURE ASCII (type-checked when foldable, runtime
  * exception otherwise): ASCII targets can be counted at the BYTE
  * level of UTF-8 text — continuation and lead bytes of multibyte
  * characters are ≥ 0x80 and can never equal an ASCII byte — so the
  * byte count equals the `replace`-form's character count on ANY
  * input text, multibyte included ([[graft.CharClassCountsSpec]] pins
  * both). A repeated alphabet character counts into its FIRST slot
  * (later slots 0), matching no sane caller but defined anyway. NULL
  * if either input is NULL.
  *
  * Registered as SQL function `char_class_counts` by
  * [[GraftExtensions]].
  */
case class CharClassCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"char_class_counts requires (STRING, STRING), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
    else if (right.foldable && right.eval() != null &&
        !CharClassCountsUtil.isAscii(right.eval().asInstanceOf[UTF8String]))
      TypeCheckResult.TypeCheckFailure(
        "char_class_counts alphabet must be pure ASCII")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = left.nullable || right.nullable

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(s: Any, alpha: Any): Any =
    CharClassCountsUtil.count(
      s.asInstanceOf[UTF8String], alpha.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, a) =>
      s"${ev.value} = graft.plans.CharClassCountsUtil.count($s, $a);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharClassCounts =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "char_class_counts"
}

/** Loop shared by interpreted eval and generated code. */
object CharClassCountsUtil {
  def isAscii(s: UTF8String): Boolean = {
    var i = 0
    val n = s.numBytes()
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** The 128-slot dispatch table for `alphabet`, cached per thread
    * keyed by REFERENCE: every caller passes the alphabet as a foldable
    * literal, which codegen holds as one stable UTF8String instance per
    * generated class — so after the first row the per-row cost is one
    * `eq` check, not a table rebuild + validation (which at ~155 steps
    * rivals the |text| scan on short documents — exactly the per-row
    * overhead this kernel exists to remove). A different interleaved
    * alphabet (never in practice) just rebuilds; the ThreadLocal keeps
    * task threads from racing one shared slot array. */
  private val cachedTable =
    new ThreadLocal[(UTF8String, Array[Int])]()

  private def tableFor(alphabet: UTF8String): Array[Int] = {
    val hit = cachedTable.get()
    if (hit != null && (hit._1 eq alphabet)) return hit._2
    val m = alphabet.numBytes()
    // byte -> first alphabet slot; -1 = not in the alphabet
    val slot = new Array[Int](128)
    java.util.Arrays.fill(slot, -1)
    var j = m - 1
    while (j >= 0) { // reverse, so duplicates resolve to the FIRST slot
      val b = alphabet.getByte(j)
      if (b < 0) throw new IllegalArgumentException(
        "char_class_counts alphabet must be pure ASCII")
      slot(b) = j
      j -= 1
    }
    cachedTable.set((alphabet, slot))
    slot
  }

  def count(s: UTF8String, alphabet: UTF8String): ArrayData = {
    val slot = tableFor(alphabet)
    val counts = new Array[Int](alphabet.numBytes())
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0 && slot(b) >= 0) counts(slot(b)) += 1
      i += 1
    }
    new GenericArrayData(counts)
  }
}
