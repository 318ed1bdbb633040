package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature over an `array<string>` of words: element j
  * is min over words of `(h44(w)·aⱼ + bⱼ) mod 2⁴⁴` for the fixed
  * [[TextFunctions.minhashPerms]] permutations.
  *
  * Why custom (SURVEY §7.5 preference order): the built-in formulation
  * ([[TextFunctions.minhashSigBuiltin]]) is k+1 higher-order passes per
  * document — one `transform` hashing every word, then k
  * `transform`+`array_min` passes over the hash array, each through
  * interpreted boxed lambdas. This expression hashes each word ONCE
  * (ThreadLocal digest, zero string allocation) and folds all k minima
  * in the same pass over the unsafe array, participating in
  * whole-stage codegen via a static call. It sits on the dedup hot
  * path: every LSH band build (q_dedup_minhash, dup groups,
  * [[graft.engine.DedupGate]], the streaming corpus gate) signatures
  * the corpus through it.
  *
  * Value-identical to the HOF chain (property-tested in TextHashSpec),
  * null handling included: null words are skipped (array_min skips
  * nulls), and an empty/all-null input yields an all-null signature
  * (array_min of an empty array is NULL). Min is duplicate-invariant,
  * so pre-distincting the words remains optional. The DuckDB oracle
  * ([[TextFunctions.minhashSigSql]]) is unchanged.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    MinHashSig.sig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.MinHashSig.sig($a)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val A = TextFunctions.minhashPerms.map(_._1).toArray
  private val B = TextFunctions.minhashPerms.map(_._2).toArray
  private val M44 = 1L << 44

  def sig(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    val k = A.length
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        any = true
        val h = Md5Prefix44.hash(ws.getUTF8String(i).getBytes)
        var j = 0
        while (j < k) {
          val v = (h * A(j) + B(j)) % M44
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(new Array[Any](k))
    else new GenericArrayData(mins)
  }

  def apply(words: Column): Column =
    Shims.column(MinHashSig(Shims.expression(words)))
}
