package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `ARRAY<DOUBLE>` columns — the hot inner
  * loop of every similarity operator (cosine top-k, ANN re-rank,
  * near-dup verification), as one codegen'd pass.
  *
  * The composed builtin form `aggregate(zip_with(a, b, *), 0.0, +)`
  * is semantically right but allocates an intermediate products array
  * per row and evaluates the lambdas interpreted (per-element closure
  * dispatch). This expression is a tight primitive loop that
  * WholeStageCodegen inlines like any builtin.
  *
  * Bit-exactness contract: the loop is the SAME sequential left fold in
  * `double` as both the composed form and the DuckDB oracle's
  * `list_sum(list_transform(list_zip(a, b), x -> x[1]*x[2]))` — IEEE-754
  * addition in identical order on identical operands, so all three
  * produce the same bits ([[graft.VectorDotSpec]] asserts it against
  * the composed form). NULL result when either input is NULL, lengths
  * differ, or any element is NULL (the composed form's `acc + NULL`
  * poisoning, made explicit).
  *
  * Registered as SQL function `vector_dot` by [[GraftExtensions]].
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires two ARRAY<DOUBLE> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorDotUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}$$d = graft.plans.VectorDotUtil.dot($a, $b);
         |if (${ev.value}$$d == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}$$d.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

/** Loop shared by interpreted eval and generated code (object = static
  * forwarders callable from generated Java). */
object VectorDotUtil {
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
