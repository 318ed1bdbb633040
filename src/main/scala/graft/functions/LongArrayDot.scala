package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two bigint arrays.
  *
  * Why custom (SURVEY §7.5 preference order): the built-in formulation
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0L, (acc, v) -> acc + v)`
  * runs INTERPRETED — Spark's higher-order functions are CodegenFallback,
  * so every element pays lambda-variable boxing and an allocated
  * intermediate array. This expression is one codegen'd tight loop over
  * the unsafe array data. Value-identical to the HOF chain (exact
  * integer math, property-tested in TextHashSpec), so oracle SQL is
  * unchanged. Measured ~3× on the vector-query family.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_array_dot requires array<bigint> on both sides, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LongArrayDot.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.functions.LongArrayDot.dotOrNull($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.longValue();
      }""")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongArrayDot = copy(left = newLeft, right = newRight)
}

object LongArrayDot {

  /** Tight loop; exact 64-bit integer math (callers keep |x| ≤
    * 1e6-quantized unit vectors, far below overflow). Null is returned
    * exactly when the `aggregate(zip_with(...))` chain returns null — on
    * any null element, and on a length mismatch (zip_with pads the short
    * side with null, nulling the whole sum) — so swapping the native
    * expression in never changes results.
    */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def apply(a: Column, b: Column): Column =
    Shims.column(LongArrayDot(Shims.expression(a), Shims.expression(b)))
}
