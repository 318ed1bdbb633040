package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType}

/** Native 32-bit SimHash over a pre-hashed `array<bigint>` of word
  * hashes: bit i of the result is set when Σ over hashes of
  * (bit i ? +1 : −1) is positive.
  *
  * Why custom (SURVEY §7.5 preference order): the built-in formulation
  * ([[TextFunctions.simhash32]] — a 32-wide `zip_with` folded inside
  * `aggregate`, then a second zip/aggregate to assemble bits) is a
  * higher-order-function chain — CodegenFallback, interpreted: per
  * document it allocates ~|words| boxed 32-element arrays and runs
  * every +1/−1 update through a boxed lambda. Profiling q_dedup_simhash
  * put essentially the whole query in this leaf. This expression is one
  * primitive pass (|words|·32 long ops into a stack array) and
  * participates in whole-stage codegen via a static call.
  *
  * Value-identical to the HOF chain, null handling included: a NULL
  * element poisons every per-bit accumulator in the HOF form (null
  * arithmetic propagates through the fold), which collapses every
  * `CASE WHEN b > 0` to 0 — so both forms return 0 there
  * (property-tested against the HOF twin in TextHashSpec). The DuckDB
  * oracle SQL ([[TextFunctions.simhash32Sql]]) is unchanged.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<bigint>, got ${t.simpleString}")
  }

  override def dataType: DataType = DataTypes.LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(a: Any): Any =
    SimHash32.simhash(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SimHash32.simhash($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {

  def simhash(hs: ArrayData): Long = {
    val n = hs.numElements()
    val counters = new Array[Long](32)
    var i = 0
    while (i < n) {
      // A null element poisons the whole fold in the HOF twin (every
      // accumulator goes null, every b > 0 test goes false) — mirror
      // that as an immediate 0.
      if (hs.isNullAt(i)) return 0L
      val h = hs.getLong(i)
      var b = 0
      while (b < 32) {
        counters(b) += ((h >> b) & 1L) * 2L - 1L
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (counters(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  def apply(hashes: Column): Column =
    Shims.column(SimHash32(Shims.expression(hashes)))
}
