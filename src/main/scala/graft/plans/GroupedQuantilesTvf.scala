package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL surface for [[graft.engine.GroupedQuantiles]] — a table-valued
  * function computing exact interpolated grouped quantiles with the
  * histogram-refinement engine instead of the single-reducer
  * `percentile` aggregate:
  *
  * {{{
  *   SELECT * FROM grouped_quantiles(
  *     'lineitem_v',        -- table or view name
  *     'l_returnflag',      -- comma-separated group columns
  *     'price_cents',       -- integer value column
  *     'p50=0.5,p99=0.99')  -- out_name=probability pairs
  * }}}
  *
  * Results are bit-identical to `percentile`/DuckDB `quantile_cont`
  * (the engine replicates their interpolation formula — see the engine
  * scaladoc). Because the engine is a pure composition of standard
  * operators (no eager jobs), the TVF expands at ANALYSIS time:
  * [[GroupedQuantilesPlan]] parks unresolved (like Spark's own
  * unresolved TVF nodes) until its relation resolves, then
  * [[ExpandGroupedQuantiles]] splices in the engine's full logical
  * plan. Everything downstream — optimizer, AQE, codegen — sees only
  * built-in operators; EXPLAIN shows the real two-phase plan.
  */
object GroupedQuantilesTvf {

  def fromArgs(args: Seq[Expression]): LogicalPlan = {
    def str(e: Expression, what: String): String = e match {
      case org.apache.spark.sql.catalyst.expressions
          .Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
        v.toString
      case _ => throw new IllegalArgumentException(
        s"grouped_quantiles: $what must be a string literal, got $e")
    }
    args match {
      case Seq(t, g, v, p) =>
        val table = str(t, "the table name")
        val groupCols = str(g, "the group columns").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
        val probs = str(p, "the quantile spec").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq.map { pair =>
            pair.split("=") match {
              case Array(name, prob) => name.trim -> prob.trim.toDouble
              case _ => throw new IllegalArgumentException(
                s"grouped_quantiles: bad quantile spec entry '$pair' " +
                  "(want out_name=probability)")
            }
          }
        require(groupCols.nonEmpty,
          "grouped_quantiles: need at least one group column")
        require(probs.nonEmpty,
          "grouped_quantiles: need at least one out_name=probability pair")
        GroupedQuantilesPlan(groupCols, str(v, "the value column"), probs,
          UnresolvedRelation(
            CatalystSqlParser.parseMultipartIdentifier(table)))
      case other =>
        throw org.apache.spark.sql.graftshim.Shims
          .wrongNumArgs("grouped_quantiles", 4, other.size)
    }
  }
}

/** Placeholder node between parsing and expansion. Deliberately never
  * `resolved` (same pattern as Spark's unresolved TVF nodes), so the
  * enclosing query cannot resolve against it before
  * [[ExpandGroupedQuantiles]] replaces it with the engine's plan.
  */
case class GroupedQuantilesPlan(groupCols: Seq[String], valueCol: String,
    probs: Seq[(String, Double)], child: LogicalPlan) extends UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : GroupedQuantilesPlan = copy(child = newChild)
}

/** Analysis rule: once the TVF's relation resolves, splice in the
  * engine-built logical plan.
  */
case class ExpandGroupedQuantiles(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case gq: GroupedQuantilesPlan if gq.child.resolved =>
        graft.engine.GroupedQuantiles.interpolated(
            org.apache.spark.sql.graftshim.Shims.ofRows(spark, gq.child),
            gq.groupCols, gq.valueCol, gq.probs)
          .queryExecution.analyzed
    }
}
