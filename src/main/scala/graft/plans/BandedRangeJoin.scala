package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: a pure range-predicate inner join
  * (`abs(x − y) <= W`, no equi keys) plans as BroadcastNestedLoopJoin —
  * O(|L|·|R|) comparisons, the classic scale cliff for event-correlation
  * joins. This rule rewrites it to the banded equi-join (the same shape
  * `q_range_join` hand-writes): band the axis into W-sized buckets, fan
  * the left side out to bucket ± 1 (covers the whole ± W window; any
  * qualifying pair lands in exactly one candidate bucket), and join on
  * bucket equality with the original predicate kept as the residual
  * condition. Planning then picks a hash/sort-merge join keyed on the
  * band — per-bucket work only, linear end-to-end.
  *
  * Scope (deliberately narrow, soundness first): INNER joins whose
  * condition is deterministic and has a conjunct `abs(a − b) <= w` /
  * `< w` on integral types with a positive literal bound, sides
  * resolving to opposite children, and NO existing equi-join conjunct
  * (if one exists Spark already hash-joins; extra banding would only
  * add fan-out). The original condition is preserved verbatim, so the
  * rewrite can never change results — only the join strategy.
  *
  * Extreme-value caveat: banding arithmetic is overflow-safe for every
  * long and every matched w ≥ 2 (floor division is computed as
  * truncating `div` plus a remainder-sign correction, never
  * `a − pmod(a, w)`, which underflows near Long.MinValue; the band
  * domain [MinValue div w − 1, MaxValue div w] keeps the ±1 fan-out in
  * Long range). w = 1 is deliberately not matched — there the band
  * equals the axis value and the fan-out itself could overflow.
  * Under Spark 4's default ANSI mode (which every session this repo
  * creates runs), a pair whose `a − b` overflows 64-bit arithmetic
  * (axis values straddling ±2^63) raises ARITHMETIC_OVERFLOW in BOTH
  * the nested-loop and the banded plan — the residual predicate is the
  * original condition — so the rewrite introduces no new failure mode
  * and drops no ANSI-mode match. Int axes (cast to long) can never
  * overflow the subtraction at all.
  *
  * Why a `Rule[LogicalPlan]` (SURVEY §7.5 preference (c)): no
  * composition of built-ins lets a USER'S naive range join avoid the
  * nested loop — the fix has to happen to the plan, after analysis.
  * Registered via [[graft.GraftExtensions]] `injectOptimizerRule`.
  */
object BandedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** Marker prefix for the injected band columns; also the fixpoint
    * guard — a join whose condition already references a band column is
    * our own rewrite and must not fire again.
    */
  private val BandCol = "__graft_band"

  private[graft] def floorDiv(a: Expression, w: Long): Expression = {
    val lit = Literal(w, LongType)
    // Integer floor division from truncating `div` plus a correction
    // when the remainder is negative (a < 0, not on a band boundary) —
    // a plain `div` truncates toward zero and misbands negative axes.
    // Written this way (not `(a − pmod(a, w)) div w`) because the
    // subtract form underflows for a within w of Long.MinValue; here
    // div and % never overflow for w > 0, and the band domain
    // [MinValue div w − 1, MaxValue div w] keeps the ±1 fan-out in
    // range for every w ≥ 2 (w = 1 bands are the axis itself; see the
    // extreme-value caveat above).
    val q = IntegralDivide(a, lit)
    If(LessThan(Remainder(a, lit), Literal(0L, LongType)),
      Subtract(q, Literal(1L, LongType)), q)
  }

  private def longBound(e: Expression): Option[Long] = e match {
    case Literal(w: Long, LongType) => Some(w)
    case Literal(w: Int, IntegerType) => Some(w.toLong)
    case _ => None
  }

  /** `abs(a − b) <= w` (or `<`): returns (leftSideExpr, rightSideExpr, w). */
  private def matchRange(conjunct: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def orient(x: Expression, y: Expression): Option[(Expression, Expression)] =
      if (x.references.subsetOf(left.outputSet) &&
          y.references.subsetOf(right.outputSet)) Some((x, y))
      else if (y.references.subsetOf(left.outputSet) &&
          x.references.subsetOf(right.outputSet)) Some((y, x))
      else None
    def integral(e: Expression): Boolean =
      e.dataType == LongType || e.dataType == IntegerType
    val parts = conjunct match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), b) => Some((x, y, b))
      case LessThan(Abs(Subtract(x, y, _), _), b) => Some((x, y, b))
      case GreaterThanOrEqual(b, Abs(Subtract(x, y, _), _)) => Some((x, y, b))
      case GreaterThan(b, Abs(Subtract(x, y, _), _)) => Some((x, y, b))
      case _ => None
    }
    parts.flatMap { case (x, y, b) =>
      for {
        // w ≥ 2 only: at w = 1 the band IS the axis value, so the ±1
        // fan-out arithmetic (bandL ± 1) can overflow Long at the axis
        // extremes — under ANSI mode the rewritten plan would raise on
        // inputs the nested-loop plan executes fine. Banding also buys
        // nothing at w = 1 (three candidate buckets to find |a−b| ≤ 1).
        w <- longBound(b) if w > 1
        if integral(x) && integral(y)
        (l, r) <- orient(x, y)
      } yield (l, r, w)
    }
  }

  private def isEqui(conjunct: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean = conjunct match {
    case EqualTo(a, b) => spansBoth(a, b, left, right)
    case EqualNullSafe(a, b) => spansBoth(a, b, left, right)
    case _ => false
  }

  private def spansBoth(a: Expression, b: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
      (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && cond.deterministic &&
          !cond.references.exists(_.name.startsWith(BandCol)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.exists(isEqui(_, left, right))) j
      else conjuncts.flatMap(matchRange(_, left, right)).headOption match {
        case None => j
        case Some((lExpr, rExpr, w)) =>
          val cast = (e: Expression) =>
            if (e.dataType == LongType) e else Cast(e, LongType)
          val bandL = floorDiv(cast(lExpr), w)
          val one = Literal(1L, LongType)
          val genAttr =
            AttributeReference(s"${BandCol}_l", LongType, nullable = true)()
          val fanned = Generate(
            Explode(CreateArray(Seq(
              Subtract(bandL, one), bandL, Add(bandL, one)))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(genAttr), child = left)
          val bandR = Alias(floorDiv(cast(rExpr), w), s"${BandCol}_r")()
          val keyed = Project(right.output :+ bandR, right)
          val newJoin = Join(fanned, keyed, Inner,
            Some(And(EqualTo(genAttr, bandR.toAttribute), cond)), hint)
          // Restore the original output (band columns are plumbing).
          Project(j.output, newJoin)
      }
  }
}
