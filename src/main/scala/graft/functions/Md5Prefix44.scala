package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing [[TextFunctions.h44]] — the top
  * 44 bits of md5(input) as a BIGINT — directly from the digest bytes.
  *
  * Why custom (SURVEY §7.5 preference order): the built-in formulation
  * `conv(substring(md5(x), 1, 11), 16, 10)` materializes a 32-char hex
  * UTF8String, a substring copy, and a radix-parse PER WORD in the
  * MinHash/SimHash hot paths (~30 words/doc × corpus). This expression
  * produces the same value with one ThreadLocal digest and zero string
  * allocation, and participates in whole-stage codegen via a static
  * call. Value-identical to the built-in chain (property-tested in
  * TextHashSpec), so the DuckDB oracle SQL is unchanged.
  */
case class Md5Prefix44(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix44 requires a string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix44"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix44.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix44.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix44 =
    copy(child = newChild)
}

object Md5Prefix44 {

  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 11 hex digits of md5(bytes) as an unsigned 44-bit value:
    * bytes 0..4 whole, high nibble of byte 5.
    */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 36) | ((d(1) & 0xffL) << 28) | ((d(2) & 0xffL) << 20) |
      ((d(3) & 0xffL) << 12) | ((d(4) & 0xffL) << 4) | ((d(5) & 0xf0L) >>> 4)
  }

  /** Column-API entry point. */
  def apply(c: Column): Column =
    Shims.column(Md5Prefix44(Shims.expression(c)))
}
