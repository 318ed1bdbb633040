package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.IntegerType

/** SQL surface for bounded-diameter weakly-connected components
  * (`graft.queries.GraphQueries.componentsK`) — a table-valued function
  * over any edge relation, beside `pagerank`:
  *
  * {{{
  *   SELECT * FROM connected_components(
  *     'edges_v',   -- table or view with the edge list
  *     'src',       -- source-node column
  *     'dst',       -- destination-node column
  *     8)           -- propagation rounds (1..MaxRounds)
  *   -- returns (node, component): component = the minimum node id
  *   -- within `rounds` hops — the true component minimum whenever
  *   -- every node is within `rounds` hops of its component's min node
  * }}}
  *
  * Weak connectivity ignores direction, so callers symmetrize first
  * (supply both directions), exactly as for an undirected `pagerank`.
  * The expansion is K levels of the zero-weight self-loop
  * min-relaxation — one equi-join + one min-aggregate per level, state
  * referenced once, no checkpoints (`GraphQueries.relaxRounds`); the
  * per-level node-set distinct shares one Exchange across levels via
  * reuse, the same property the `pagerank` TVF's weighted relation
  * relies on. `MaxRounds` bounds the plan depth at parse. For
  * unbounded-diameter graphs use the DataFrame-side
  * `engine.LabelPropagation` (pointer-doubling to the true fixpoint);
  * q_components vs q_sql_components pins the two forms against one
  * oracle.
  */
object ComponentsTvf {

  val MaxRounds = 16

  def fromArgs(args: Seq[Expression]): LogicalPlan = {
    def str(e: Expression, what: String): String = e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
        v.toString
      case _ => throw new IllegalArgumentException(
        s"connected_components: $what must be a string literal, got $e")
    }
    def rounds(e: Expression): Int = e match {
      case Literal(v: Int, IntegerType) if v >= 1 && v <= MaxRounds => v
      case _ => throw new IllegalArgumentException(
        s"connected_components: the round count must be an integer " +
          s"literal in 1..$MaxRounds (each round is a plan level), got $e")
    }
    args match {
      case Seq(t, src, dst, k) =>
        ComponentsPlan(str(src, "the source column"),
          str(dst, "the destination column"), rounds(k),
          UnresolvedRelation(CatalystSqlParser.parseMultipartIdentifier(
            str(t, "the table name"))))
      case other =>
        throw org.apache.spark.sql.graftshim.Shims
          .wrongNumArgs("connected_components", 4, other.size)
    }
  }
}

/** Placeholder between parsing and expansion — deliberately never
  * `resolved` (the unresolved-TVF pattern, like [[PageRankPlan]]).
  */
case class ComponentsPlan(srcCol: String, dstCol: String, rounds: Int,
    child: LogicalPlan) extends UnaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : ComponentsPlan = copy(child = newChild)
}

/** Analysis rule: once the TVF's relation resolves, splice in the
  * K-level min-label relaxation plan.
  */
case class ExpandComponents(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case cc: ComponentsPlan if cc.child.resolved =>
        val edges = org.apache.spark.sql.graftshim.Shims
          .ofRows(spark, cc.child)
          .select(col(cc.srcCol).as("src"), col(cc.dstCol).as("dst"))
        // node set derived from the edges: repeated per plan level, but
        // behind an identical distinct Exchange → materialized once by
        // exchange reuse (the BFS loop-relation property)
        val nodes = edges.select(col("src").as("node"))
          .unionByName(edges.select(col("dst").as("node")))
          .distinct()
        graft.queries.GraphQueries.componentsK(edges, nodes, cc.rounds)
          .queryExecution.analyzed
    }
}
