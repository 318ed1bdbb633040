package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** SQL surface for [[graft.engine.DistributedRank]]'s core pattern — a
  * TABLE-VALUED FUNCTION computing a global 1-based row number without
  * the single-task `WindowExec` that `row_number() OVER (ORDER BY …)`
  * (no PARTITION BY) plans to:
  *
  * {{{
  *   SELECT * FROM global_rank('orders_v', 'o_totalprice DESC, o_orderkey', 'rk')
  *   WHERE rk <= 100
  * }}}
  *
  * Args: (table or view name, ORDER BY text in full sortItem syntax,
  * output column name). The order text is parsed with the real SQL
  * parser (DESC / NULLS FIRST all work) and resolved against the
  * relation like any other expression.
  *
  * Unlike the DataFrame engine (which runs its stats job eagerly at
  * plan-construction time), this is a first-class operator: a logical
  * [[GlobalRank]] node that survives analysis/optimization, planned by
  * [[GraftStrategies]] into [[GlobalRankExec]], whose required child
  * distribution is `OrderedDistribution(order)` — EnsureRequirements
  * plants the range shuffle + per-partition sort, and the exec then
  * runs the same two phases as `DistributedRank`: one lightweight job
  * collecting per-partition row counts (numPartitions longs on the
  * driver), then a per-partition pass adding `offset + local index`.
  * Phase 2 re-reads phase 1's shuffle files (same RDD ⇒ stage reuse),
  * so the sort happens once. EXPLAIN stays side-effect-free.
  */
object GlobalRank {

  /** TVF builder for GraftExtensions: three string literals. */
  def fromArgs(args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : LogicalPlan = {
    def str(e: org.apache.spark.sql.catalyst.expressions.Expression,
        what: String): String = e match {
      case org.apache.spark.sql.catalyst.expressions
          .Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
        v.toString
      case _ => throw new IllegalArgumentException(
        s"global_rank: $what must be a string literal, got $e")
    }
    args match {
      case Seq(t, o, r) =>
        val table = str(t, "the table name")
        val orderSql = str(o, "the ORDER BY text")
        val out = str(r, "the output column name")
        GlobalRank(parseOrder(orderSql),
          AttributeReference(out, LongType, nullable = false)(),
          UnresolvedRelation(
            CatalystSqlParser.parseMultipartIdentifier(table)))
      case other =>
        throw org.apache.spark.sql.graftshim.Shims
          .wrongNumArgs("global_rank", 3, other.size)
    }
  }

  /** Full sortItem syntax via the real parser: wrap in a dummy query
    * and pull the Sort node's order back out.
    */
  private[plans] def parseOrder(orderSql: String): Seq[SortOrder] =
    CatalystSqlParser.parsePlan(s"SELECT * FROM __graft_tvf ORDER BY $orderSql")
      .collectFirst { case s: Sort => s.order }
      .getOrElse(throw new IllegalArgumentException(
        s"global_rank: could not parse ORDER BY text '$orderSql'"))
}

/** Logical node: child's rows annotated with their global rank in
  * `order`. `rankAttr` lives in the constructor so analyzer/optimizer
  * copies preserve its exprId (a lazy val would mint a fresh attribute
  * on every `withNewChildInternal`, dangling outer references).
  */
case class GlobalRank(order: Seq[SortOrder], rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : GlobalRank = copy(child = newChild)
}

/** Physical two-phase global rank (see [[GlobalRank]] object doc). */
case class GlobalRankExec(order: Seq[SortOrder],
    rankAttr: AttributeReference, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(order))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    // Phase 1: per-partition row counts — numPartitions longs on the
    // driver, nothing else. Runs as its own job; phase 2's job reuses
    // the same shuffled/sorted RDD, so the sort is not recomputed.
    val counts = rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, {
        var n = 0L; while (it.hasNext) { it.next(); n += 1L }; n
      })), preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val childOutput = child.output
    val outAttrs = output
    val rank = rankAttr
    rdd.mapPartitionsWithIndex({ (i, it) =>
      val proj = UnsafeProjection.create(outAttrs, childOutput :+ rank)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      var rk = offsets(i)
      it.map { row =>
        rk += 1L
        rankRow.setLong(0, rk)
        proj(joined(row, rankRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : GlobalRankExec = copy(child = newChild)
}

/** Planner strategy for the graft logical nodes. */
object GraftStrategies extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GlobalRank =>
      GlobalRankExec(g.order, g.rankAttr, planLater(g.child)) :: Nil
    case _ => Nil
  }
}
