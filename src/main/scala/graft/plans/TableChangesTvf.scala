package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL surface for [[graft.engine.ChangeFeed]] — the change feed as a
  * table-valued function, so a SQL-only consumer can tail a
  * manifest-managed table without the Scala API:
  *
  * {{{
  *   SELECT * FROM table_changes(
  *     '/warehouse/fact',   -- manifest-managed table path
  *     3, 5,                -- (vFrom, vTo] committed versions
  *     'k1,k2')             -- comma-separated key columns
  * }}}
  *
  * Output = the table's columns plus `_change_type`
  * (insert | delete | update_preimage | update_postimage), net over
  * the range, value-identical rewrites filtered — exactly
  * `ChangeFeed.changes`. All four arguments are literals, so the TVF
  * expands at ANALYSIS time into the feed's ordinary logical plan
  * (two file-subset scans of ONLY the changed files, one full-outer
  * key join, explode classification); the optimizer, AQE and codegen
  * see only built-in operators, and EXPLAIN shows the real plan. The
  * version arguments make the read REPEATABLE by construction — the
  * same range always yields the same rows, the property a SQL
  * consumer needs to checkpoint its own progress.
  */
object TableChangesTvf {

  private def str(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case _ => throw new IllegalArgumentException(
      s"table_changes: $what must be a string literal, got $e")
  }

  private def ver(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case _ => throw new IllegalArgumentException(
      s"table_changes: $what must be an integer literal, got $e")
  }

  def fromArgs(args: Seq[Expression]): LogicalPlan = args match {
    case Seq(p, f, t, k) =>
      val keys = str(k, "the key columns").split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
      require(keys.nonEmpty, "table_changes: need at least one key column")
      TableChangesPlan(str(p, "the table path"),
        ver(f, "vFrom"), ver(t, "vTo"), keys)
    case other =>
      throw org.apache.spark.sql.graftshim.Shims
        .wrongNumArgs("table_changes", 4, other.size)
  }
}

/** Placeholder between parsing and expansion — deliberately never
  * `resolved` (the engine's standing TVF pattern), so nothing resolves
  * against it before [[ExpandTableChanges]] splices in the feed plan.
  */
case class TableChangesPlan(path: String, vFrom: Long, vTo: Long,
    keys: Seq[String]) extends LeafNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
}

/** Analysis rule: replace the placeholder with the change feed's
  * analyzed plan (manifest reads happen here, analysis time — the
  * same moment Spark resolves any table reference).
  */
case class ExpandTableChanges(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case tc: TableChangesPlan =>
        graft.engine.ChangeFeed
          .changes(spark, tc.path, tc.vFrom, tc.vTo, tc.keys)
          .queryExecution.analyzed
    }
}
