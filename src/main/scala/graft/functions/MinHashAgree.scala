package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native signature-agreement count over two bigint arrays: the number
  * of positions where both elements are non-null and equal.
  *
  * Why custom (SURVEY §7.5 preference order, [[LongArrayDot]] twin):
  * the built-in formulation `aggregate(zip_with(sa, sb, (x, y) -> CASE
  * WHEN x = y THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v)` runs
  * INTERPRETED — higher-order functions are CodegenFallback — and it
  * sits in the WORST possible place: Catalyst pushes the downstream
  * `matches >= k-1` filter through the candidate `distinct()` into the
  * LSH band self-join, so the chain is evaluated as the join's bound
  * condition once per band-bucket PAIR ROW. The round-9 10× sweep
  * caught it: stage-level thread dumps showed every executor burning
  * its CPU in `ZipWith.eval`/`ArrayAggregate.eval` under
  * `HashJoin.boundCondition`, ~75 CPU-minutes at a 50k-doc corpus for
  * an expression this loop does in milliseconds. One codegen'd tight
  * loop over the unsafe arrays keeps the pushdown (which is the RIGHT
  * plan — filtering before `distinct` shrinks the exchange) affordable.
  *
  * Value-identical to the HOF chain (property-tested in TextHashSpec):
  * null ELEMENTS contribute 0 (`CASE WHEN null THEN .. ELSE 0`), a
  * length mismatch counts only the shared prefix (zip_with pads with
  * nulls → 0), a NULL array yields NULL (BinaryExpression null
  * propagation). The DuckDB oracle (`list_zip`+`list_sum` in
  * `minhashScoredCte`) is unchanged.
  */
case class MinHashAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_agree requires array<bigint> on both sides, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "minhash_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinHashAgree.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MinHashAgree.count($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MinHashAgree = copy(left = newLeft, right = newRight)
}

object MinHashAgree {

  def count(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  def apply(a: Column, b: Column): Column =
    Shims.column(MinHashAgree(Shims.expression(a), Shims.expression(b)))
}
