package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram shingling: `array<string>` of tokens →
  * `array<string>` of DISTINCT space-joined n-grams, first-occurrence
  * order.
  *
  * Why custom (SURVEY §7.5 preference order): the built-in formulation
  * `array_distinct(transform(sequence(1, size(ws) − (n−1)),
  * i -> array_join(slice(ws, i, n), ' ')))` is a higher-order-function
  * chain — CodegenFallback, interpreted: per document it allocates the
  * index sequence, one sliced array + joined string per position
  * through boxed lambda variables, then an O(k²)-compare distinct over
  * the result. Profiling q_setsim_join showed this single leaf cost
  * ~3.5 s of an 8 s query at sf0.1 (and every consuming plan branch
  * pays it again). This expression is one pass over the unsafe array
  * with a hash-set dedup, and it participates in whole-stage codegen
  * via a static call. Value-identical to the HOF chain (order
  * included — property-tested in TextHashSpec), so the DuckDB oracle
  * SQL is unchanged.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(a: Any): Any =
    WordShingles.shingles(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.WordShingles.shingles($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** One pass, first-occurrence dedup. Null tokens are skipped inside a
    * joined gram exactly like `array_join`'s default null handling, so
    * the expression is a drop-in for the HOF chain on any input.
    */
  def shingles(ws: ArrayData, n: Int): ArrayData = {
    val len = ws.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i + n <= len) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (ws.isNullAt(i + j)) null else ws.getUTF8String(i + j)
        j += 1
      }
      // concatWs skips nulls — array_join semantics; the result is a
      // fresh buffer, safe to retain across rows
      out.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  def apply(words: Column, n: Int): Column =
    Shims.column(WordShingles(Shims.expression(words), n))
}
