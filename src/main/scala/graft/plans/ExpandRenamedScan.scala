package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Coalesce, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, MergeIntoTable, Project, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.catalog.GraftTable

/** SQL reads of a table with live RENAME COLUMN chains (round 15).
  *
  * [[graft.engine.Manifest.renameColumn]] is metadata-only: files
  * written before the rename still hold the column's data under its
  * old name. Library reads resolve that inside
  * [[graft.engine.Manifest.readFiles]]; this rule is the SQL-catalog
  * twin. A [[DataSourceV2Relation]] over a [[GraftTable]] whose pinned
  * schema carries prior-name chains is swapped for the table's
  * UNION-schema variant (current + prior names, absent-per-file ⇒
  * NULL) with a Project on top that coalesces each chain back to the
  * logical column — REUSING the original relation's attribute ids, so
  * references bound anywhere above keep resolving. Catalyst then
  * prunes the union scan to exactly the names each query needs, and
  * filters on never-renamed columns keep their pushdown (they sit
  * under a Project of aliases, which pushdown walks through).
  *
  * DML and write targets are deliberately NOT expanded — the engine
  * verbs behind [[RewriteGraftDml]] and the V1 write fallback resolve
  * renames themselves (their reads all funnel through the manifest's
  * rename-aware readers), and `AppendData`/`InsertIntoStatement`
  * require a bare relation in target position.
  */
case class ExpandRenamedScan(spark: SparkSession) extends Rule[LogicalPlan] {

  private def expandable(p: LogicalPlan): Boolean = p match {
    case r: DataSourceV2Relation => r.table match {
      // DV-bearing snapshots are [[ApplyDeletionVectors]]'s to swap —
      // its V1 plan coalesces rename chains itself (readFiles), and
      // expanding here first would leave it a union-schema relation
      // whose coalesced re-read breaks the Project above (round 17)
      case t: GraftTable =>
        !t.exposeUnion && t.renamePriors.nonEmpty && t.dvMap.isEmpty
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // fast path: almost no table ever renames a column — one metadata
    // sweep (plans + subquery plans) and out
    def hasTarget(p: LogicalPlan): Boolean =
      p.exists(n => expandable(n) || n.expressions.exists(_.exists {
        case s: SubqueryExpression => hasTarget(s.plan)
        case _ => false
      }))
    if (!hasTarget(plan)) plan else rewrite(plan)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = {
    val guarded = plan match {
      // write/DML targets stay bare relations; only their QUERY sides
      // (and expression subqueries, below) read through the expansion
      case i: InsertIntoStatement => i.copy(query = rewrite(i.query))
      case m: MergeIntoTable => m.copy(sourceTable = rewrite(m.sourceTable))
      case u: UpdateTable => u
      case d: DeleteFromTable => d
      case r: DataSourceV2Relation if expandable(r) => expand(r)
      case other => other.mapChildren(rewrite)
    }
    guarded.transformExpressions {
      case s: SubqueryExpression => s.withNewPlan(rewrite(s.plan))
    }
  }

  private def expand(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[GraftTable]
    val unionRel = DataSourceV2Relation.create(
      t.unionVariant, r.catalog, r.identifier, r.options)
    def unionAttr(name: String) =
      unionRel.output.find(_.name == name).getOrElse(
        throw new IllegalStateException(
          s"rename expansion of ${t.name()}: union scan lost column " +
            s"$name (${unionRel.output.map(_.name).mkString(", ")})"))
    val projection: Seq[NamedExpression] = r.output.map { a =>
      val chain = t.renamePriors.get(a.name) match {
        case Some(priors) =>
          Coalesce((a.name +: priors).map(unionAttr))
        case None => unionAttr(a.name)
      }
      Alias(chain, a.name)(exprId = a.exprId, qualifier = a.qualifier)
    }
    Project(projection, unionRel)
  }
}
