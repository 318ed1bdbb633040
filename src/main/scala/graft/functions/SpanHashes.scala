package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native positional word-n-gram hashing: `array<string>` of tokens →
  * `array<long>` with [[TextFunctions.h44]] of the n-gram starting at
  * each position — the NON-distinct sibling of [[WordShingles]], for
  * operators that need one value per span start (`posexplode` gives
  * `(pos, gh)` directly), e.g. exact substring-span deduplication.
  *
  * Why custom (SURVEY §7.5 preference order): the built-in formulation
  * `transform(sequence(0, size(ws) − n), i -> md5_prefix44(
  * array_join(slice(ws, i + 1, n), ' ')))` is a higher-order-function
  * chain — CodegenFallback, interpreted, one sliced array + one joined
  * gram string allocation per position through boxed lambda variables.
  * This expression is one pass over the unsafe array hashing each gram
  * via the shared ThreadLocal digest, never materializing a gram-string
  * column, and participates in whole-stage codegen via a static call.
  * Value-identical to the HOF chain (property-tested in TextHashSpec),
  * so the DuckDB oracle SQL is the same list comprehension the other
  * gram consumers use.
  */
case class SpanHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "span width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"span_hashes requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_hashes"

  override protected def nullSafeEval(a: Any): Any =
    SpanHashes.hashes(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.SpanHashes.hashes($a, $n)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

object SpanHashes {

  private val sep = UTF8String.fromString(" ")

  /** One h44 per span start, in position order; `size(ws) − n + 1`
    * elements (empty when the document is shorter than n). Null tokens
    * are skipped inside a joined gram exactly like `array_join`'s
    * default null handling, matching [[WordShingles.shingles]].
    */
  def hashes(ws: ArrayData, n: Int): ArrayData = {
    val len = ws.numElements()
    val m = len - n + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (ws.isNullAt(i + j)) null else ws.getUTF8String(i + j)
        j += 1
      }
      out(i) = Md5Prefix44.hash(UTF8String.concatWs(sep, parts: _*).getBytes)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column-API entry point. */
  def apply(words: Column, n: Int): Column =
    Shims.column(SpanHashes(Shims.expression(words), n))
}
