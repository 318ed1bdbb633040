package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftshim.Shims

import graft.catalog.GraftTable
import graft.engine.Upsert

/** SQL `UPDATE` and `MERGE INTO` for catalog-resolved warehouse tables
  * (round 13, closing the last SQL-DML gap): the analyzer resolves the
  * statement against [[GraftTable]] like any relation, then this rule
  * swaps the resolved [[UpdateTable]]/[[MergeIntoTable]] for a command
  * that runs the engine's snapshot-committing verb —
  * [[Upsert.updateWhere]] (touched-files-only rewrite) and
  * [[Upsert.mergePartitioned]]/[[Upsert.mergeParquet]] (SCD1, partition-
  * scoped when the table is partitioned). The reference reaches the same
  * semantics as Postgres `UPDATE`/`INSERT … ON CONFLICT DO UPDATE`
  * (`transformed_from_s3_to_pg.py:143-152`); this closes it for SQL
  * clients of the lakehouse without a second copy of the data.
  *
  * Scope is the canonical shapes, loudly refused otherwise:
  *  - UPDATE: top-level column assignments, a subquery-free WHERE.
  *  - MERGE: equality key condition on SAME-NAMED columns,
  *    `WHEN MATCHED THEN UPDATE SET *`, `WHEN NOT MATCHED THEN
  *    INSERT *` (either clause optional — but DO-NOTHING-on-match is
  *    the library's `upsert*` verb family, and SQL arbitrary-action
  *    merges are not restated here).
  */
case class RewriteGraftDml(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The target relation, seen through any alias chain resolution may
    * have wrapped it in (`UPDATE t`, `MERGE INTO tbl t`).
    */
  private object GraftRelation {
    def unapply(p: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
      p match {
        case r: DataSourceV2Relation => r.table match {
          case t: GraftTable => Some((r, t))
          case _ => None
        }
        case SubqueryAlias(_, child) => unapply(child)
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(GraftRelation(r, t), assignments, condition)
        if u.resolved =>
      val set = assignments.map {
        case Assignment(k: AttributeReference, v) =>
          k.name -> Shims.column(unbound(v, "UPDATE SET"))
        case Assignment(other, _) =>
          throw new UnsupportedOperationException(
            s"UPDATE ${t.name()}: only top-level column assignments are " +
              s"supported, got ${other.sql}")
      }.toMap
      GraftUpdateCommand(t,
        condition.map(c => Shims.column(unbound(c, "UPDATE WHERE")))
          .getOrElse(lit(true)), set)

    case m @ MergeIntoTable(GraftRelation(r, t), source, cond,
        matched, notMatched, notMatchedBySource, withSchemaEvolution)
        if m.resolved =>
      def refuse(what: String): Nothing =
        throw new UnsupportedOperationException(
          s"MERGE INTO ${t.name()}: $what — the supported shape is " +
            "ON <same-named key equalities> WHEN MATCHED THEN UPDATE " +
            "SET * WHEN NOT MATCHED THEN INSERT *")
      if (withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION")
      if (notMatchedBySource.nonEmpty) refuse("WHEN NOT MATCHED BY SOURCE")
      val targetCols = r.output.map(_.name)
      matched match {
        case Seq(UpdateAction(None, as, _)) =>
          if (!isFullRowByName(as, targetCols))
            refuse("WHEN MATCHED must be UPDATE SET * (full-row, by name)")
        case Seq() => refuse(
          "WHEN MATCHED THEN UPDATE SET * is required (DO NOTHING " +
            "on match is the library's upsert verb)")
        case _ => refuse("unsupported WHEN MATCHED action")
      }
      notMatched match {
        case Seq(InsertAction(None, as)) =>
          if (!isFullRowByName(as, targetCols))
            refuse("WHEN NOT MATCHED must be INSERT * (full-row, by name)")
        case Seq() => refuse(
          "WHEN NOT MATCHED THEN INSERT * is required (update-only " +
            "merges are not restated)")
        case _ => refuse("unsupported WHEN NOT MATCHED action")
      }
      val keys = keyEqualities(cond, r.output.toSeq, source.output)
        .getOrElse(refuse(
          s"ON must be a conjunction of same-named key equalities, got " +
            cond.sql))
      GraftMergeCommand(t, source, keys)

    case _ => plan
  }

  /** Re-express a resolved expression against a FRESH read of the same
    * table: attribute references unbind to names (the engine verb
    * applies them to its own snapshot scan). Subqueries would capture
    * the outer plan — refused.
    */
  private def unbound(e: Expression, where: String): Expression = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"$where: subqueries are not supported in graft DML")
    e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }
  }

  /** Are `as` exactly the identity full-row assignments `t.c = s.c`
    * (what `UPDATE SET *` / `INSERT *` resolve to), matched by name?
    */
  private def isFullRowByName(as: Seq[Assignment],
      targetCols: Seq[String]): Boolean = {
    val pairs = as.flatMap {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        Some(k.name -> v.name)
      case _ => None
    }
    pairs.size == as.size &&
      pairs.forall { case (k, v) => k == v } &&
      pairs.map(_._1).sorted == targetCols.sorted
  }

  /** `ON t.k1 = s.k1 AND t.k2 = s.k2 …` → Some(Seq(k1, k2)); anything
    * else (inequalities, different names, expressions) → None.
    */
  private def keyEqualities(cond: Expression, target: Seq[Attribute],
      source: Seq[Attribute]): Option[Seq[String]] = {
    val targetIds = target.map(_.exprId).toSet
    val sourceIds = source.map(_.exprId).toSet
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case other => Seq(other)
    }
    val keys = split(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if targetIds(a.exprId) && sourceIds(b.exprId) && a.name == b.name =>
        Some(a.name)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if targetIds(a.exprId) && sourceIds(b.exprId) && a.name == b.name =>
        Some(a.name)
      case _ => None
    }
    if (keys.exists(_.isEmpty)) None else Some(keys.flatten.distinct)
  }
}

/** `UPDATE <cat>.<ns>.<t> SET … WHERE …` → [[Upsert.updateWhere]]'s
  * touched-files-only snapshot rewrite. */
final case class GraftUpdateCommand(table: GraftTable, condition: Column,
    set: Map[String, Column]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    Upsert.updateWhere(session, table.path, condition, set)
    Seq.empty
  }
}

/** `MERGE INTO <cat>.<ns>.<t> USING src ON keys …` → the engine's SCD1
  * merge: partition-scoped ([[Upsert.mergePartitioned]]) when the table
  * is date-partitioned — its partition column must then be among the
  * merge keys — or the whole-table [[Upsert.mergeParquet]] otherwise.
  */
final case class GraftMergeCommand(table: GraftTable,
    source: LogicalPlan, keys: Seq[String]) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val targetCols = table.schema().fieldNames.toSeq
    val src = Shims.ofRows(session, source).select(targetCols.map(col): _*)
    table.partitionCols match {
      case Seq(dateCol) =>
        require(keys.contains(dateCol),
          s"MERGE INTO ${table.name()}: the table is partitioned by " +
            s"'$dateCol', which must be among the merge keys " +
            s"(got ${keys.mkString(", ")})")
        Upsert.mergePartitioned(session, table.path, src, keys, dateCol)
      case Seq() =>
        Upsert.mergeParquet(session, table.path, src, keys)
      case deep => throw new UnsupportedOperationException(
        s"MERGE INTO ${table.name()}: multi-level partition layout " +
          s"(${deep.mkString("/")}) has no SQL merge path")
    }
    Seq.empty
  }
}
