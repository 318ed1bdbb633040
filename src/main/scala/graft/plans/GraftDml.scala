package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Exists, Expression, In, InSubquery, Literal, NamedExpression, Or, OuterReference, ScalarSubquery, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, count, lit, when}
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
  * Scope (round 15), loudly refused otherwise:
  *  - UPDATE: top-level column assignments; WHERE and SET values may
  *    carry UNCORRELATED subqueries (IN / NOT IN / scalar / EXISTS),
  *    materialized bounded at COMMAND RUN time ([[GraftDmlSubqueries]]).
  *  - DELETE: subquery predicates route here (the stock DSv2 path
  *    refuses them); subquery-free DELETEs keep the stock route.
  *  - MERGE: equality key condition on SAME-NAMED columns; ordered
  *    `WHEN MATCHED [AND cond] THEN UPDATE SET * | UPDATE SET col =
  *    expr, … | DELETE` clauses; ordered `WHEN NOT MATCHED BY SOURCE
  *    [AND cond] THEN UPDATE SET col = expr, … | DELETE` clauses
  *    (round 15 — target-only expressions, whole-table rewrite scope);
  *    at most one `WHEN NOT MATCHED [AND cond] THEN INSERT * | INSERT
  *    (cols) VALUES (exprs)` (keys must be assigned from the source's
  *    same-named column; unassigned columns insert NULL). Merge keys
  *    cannot be assigned by any UPDATE; correlated subqueries refuse
  *    everywhere (restate them as a MERGE).
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
    // dynamic INSERT OVERWRITE (round 16):
    // `spark.sql.sources.partitionOverwriteMode=dynamic` (or an
    // explicit value-less PARTITION (c) spec) analyzes to
    // OverwritePartitionsDynamic; route it through the engine's
    // [[Upsert.overwritePartitions]] — staged partitions replace
    // WHOLESALE, absent partitions survive, one snapshot commit.
    // Spark has no V1 fallback exec for this node, so without the
    // rewrite the statement dies at planning.
    case o @ OverwritePartitionsDynamic(GraftRelation(_, t), query, _, _, _)
        if o.resolved =>
      GraftDynamicOverwriteCommand(t, query)

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
            "ON <same-named key equalities> with ordered WHEN MATCHED " +
            "[AND cond] THEN UPDATE SET * | UPDATE SET col = expr, … | " +
            "DELETE clauses, ordered WHEN NOT MATCHED BY SOURCE [AND " +
            "cond] THEN UPDATE SET col = expr, … | DELETE clauses, and " +
            "at most one WHEN NOT MATCHED [AND cond] THEN INSERT * | " +
            "INSERT (cols) VALUES (exprs) clause (key columns assigned " +
            "from the source's same-named column)")
      if (withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION")
      val targetCols = r.output.map(_.name)
      val keys = keyEqualities(cond, r.output.toSeq, source.output)
        .getOrElse(refuse(
          s"ON must be a conjunction of same-named key equalities, got " +
            cond.sql))
      // clause conditions re-expressed over the merge's combined row:
      // target columns by name, source non-key columns as __src_<name>
      // (the frame [[Upsert.mergeActions]] evaluates them against)
      val targetIds = r.output.map(_.exprId).toSet
      val sourceIds = source.output.map(_.exprId).toSet
      def clauseCond(e: Expression, where: String): Column = {
        GraftDmlSubqueries.check(e, where)
        Shims.column(e.transform {
          case a: AttributeReference if targetIds(a.exprId) =>
            UnresolvedAttribute.quoted(a.name)
          case a: AttributeReference if sourceIds(a.exprId) =>
            if (keys.contains(a.name)) UnresolvedAttribute.quoted(a.name)
            else UnresolvedAttribute.quoted(s"__src_${a.name}")
        })
      }
      val actions = matched.map {
        case UpdateAction(c, as, _) =>
          val cond =
            c.map(clauseCond(_, s"MERGE INTO ${t.name()} WHEN MATCHED AND"))
          if (isFullRowByName(as, targetCols)) Upsert.MatchedUpdate(cond)
          else {
            // column-level SET (round 15): each value re-expressed over
            // the merge's combined row, same mapping as the conditions
            val set = as.map {
              case Assignment(k: AttributeReference, v)
                  if targetIds(k.exprId) =>
                k.name -> clauseCond(v,
                  s"MERGE INTO ${t.name()} WHEN MATCHED UPDATE SET")
              case Assignment(other, _) =>
                refuse("UPDATE SET assigns a non-target-column " +
                  s"expression ${other.sql}")
            }
            Upsert.MatchedUpdate(cond, set)
          }
        case DeleteAction(c) =>
          Upsert.MatchedDelete(
            c.map(clauseCond(_, s"MERGE INTO ${t.name()} WHEN MATCHED AND")))
        case other =>
          refuse(s"unsupported WHEN MATCHED action " +
            other.getClass.getSimpleName)
      }
      // by-source clauses (round 15): conditions and SET values resolve
      // against the TARGET only (Spark's analyzer enforces that), so
      // clauseCond's mapping degenerates to plain name unbinding
      val bySourceActions = notMatchedBySource.map {
        case UpdateAction(c, as, _) =>
          val cond = c.map(clauseCond(_,
            s"MERGE INTO ${t.name()} WHEN NOT MATCHED BY SOURCE AND"))
          val set = as.map {
            case Assignment(k: AttributeReference, v)
                if targetIds(k.exprId) =>
              k.name -> clauseCond(v,
                s"MERGE INTO ${t.name()} NOT MATCHED BY SOURCE UPDATE SET")
            case Assignment(other, _) =>
              refuse("NOT MATCHED BY SOURCE UPDATE SET assigns a " +
                s"non-target-column expression ${other.sql}")
          }
          Upsert.BySourceUpdate(cond, set)
        case DeleteAction(c) =>
          Upsert.BySourceDelete(c.map(clauseCond(_,
            s"MERGE INTO ${t.name()} WHEN NOT MATCHED BY SOURCE AND")))
        case other =>
          refuse(s"unsupported WHEN NOT MATCHED BY SOURCE action " +
            other.getClass.getSimpleName)
      }
      val insertSpec: Option[(Option[Column], Option[Seq[(String, Column)]])] =
        notMatched match {
          case Seq(InsertAction(c, as)) =>
            val cond = c.map(clauseCond(_,
              s"MERGE INTO ${t.name()} WHEN NOT MATCHED AND"))
            if (isFullRowByName(as, targetCols)) Some((cond, None))
            else {
              // column-level INSERT (round 15): every merge key must be
              // assigned from the source's SAME-NAMED column — the
              // anti-join that decides "not matched" runs on the source
              // key, so any other key expression could land a key that
              // is already live (a silent unique-key violation)
              val pairs = as.map {
                case Assignment(k: AttributeReference, v)
                    if targetIds(k.exprId) => k.name -> v
                case Assignment(other, _) =>
                  refuse("INSERT assigns a non-target-column " +
                    s"expression ${other.sql}")
              }
              val names = pairs.map(_._1)
              if (names.distinct != names)
                refuse("INSERT assigns a column more than once")
              keys.foreach { k =>
                pairs.collectFirst { case (`k`, v) => v } match {
                  case Some(a: AttributeReference)
                      if sourceIds(a.exprId) && a.name == k => ()
                  case Some(other) =>
                    refuse(s"INSERT must assign merge key '$k' from the " +
                      s"source's same-named column, got ${other.sql}")
                  case None =>
                    refuse(s"INSERT must assign merge key '$k' " +
                      "(unassigned keys would insert NULL keys)")
                }
              }
              val set = pairs.filterNot(p => keys.contains(p._1)).map {
                case (n, v) => n -> clauseCond(v,
                  s"MERGE INTO ${t.name()} WHEN NOT MATCHED INSERT")
              }
              Some((cond, Some(set)))
            }
          case Seq() => None
          case _ => refuse("at most one WHEN NOT MATCHED THEN INSERT clause")
        }
      if (actions.isEmpty && bySourceActions.isEmpty && insertSpec.isEmpty)
        refuse("the merge has no action clauses")
      GraftMergeCommand(t, source, keys, actions, bySourceActions,
        insertSpec)

    // DELETE with a subquery predicate (round 15): the stock DSv2 path
    // refuses subqueries outright, so the uncorrelated shapes —
    // `DELETE … WHERE k IN (SELECT …)`, the idiomatic Postgres idiom —
    // are lifted here into [[Upsert.deleteWhere]]'s touched-files-only
    // rewrite; [[GraftDmlSubqueries]] literalizes the subqueries when
    // the command RUNS. Subquery-free DELETEs keep the stock
    // SupportsDeleteV2 route (predicate translation + pushdown).
    // … and (round 17) ANY delete against a merge-on-read table — the
    // stock route only handles V2-translatable predicates (it refuses
    // `%`, functions, …) and always rewrites files; the command
    // dispatches to the deletion-vector verb with the full Column
    // predicate. EXCEPT the trivially-true condition (`DELETE FROM t`
    // with no WHERE): DV'ing every row keeps all data files live under
    // full deletion vectors, strictly worse than the stock route's
    // empty-snapshot commit — table clearing stays copy-on-write.
    case d @ DeleteFromTable(GraftRelation(_, t), condition)
        if d.resolved &&
          (condition.exists(_.isInstanceOf[SubqueryExpression]) ||
            (!triviallyTrue(condition) &&
              Upsert.dmlMode(spark, t.path) == "merge-on-read")) =>
      t.asOfVersion.foreach(v => throw new UnsupportedOperationException(
        s"cannot delete from ${t.name()}: VERSION AS OF $v is a " +
          "read-only snapshot"))
      GraftDeleteCommand(t,
        Shims.column(unbound(condition, s"DELETE FROM ${t.name()} WHERE")))

    case _ => plan
  }

  /** Is this DELETE condition semantically the trivially-true
    * predicate? `DELETE FROM t WHERE 1=1` (or `true OR x IS NULL`)
    * must route like `DELETE FROM t`: the merge-on-read verb would DV
    * every row — and refuse past the broadcast cap — where the stock
    * empty-snapshot commit succeeds for free. The analyzer hands us
    * the condition UNFOLDED, so evaluate foldable deterministic
    * subtrees and short-circuit OR/AND on constant sides (the two
    * simplifications a hand-written tautology actually hits) before
    * comparing to TRUE, mirroring GraftTable.deleteWhere's
    * ALWAYS_TRUE check on the pushed-predicate route.
    */
  private def triviallyTrue(e: Expression): Boolean = {
    def norm(x: Expression): Expression = x match {
      case Or(l, r) => (norm(l), norm(r)) match {
        case (Literal.TrueLiteral, _) => Literal.TrueLiteral
        case (_, Literal.TrueLiteral) => Literal.TrueLiteral
        case (Literal.FalseLiteral, rr) => rr
        case (ll, Literal.FalseLiteral) => ll
        case (ll, rr) => Or(ll, rr)
      }
      case And(l, r) => (norm(l), norm(r)) match {
        case (Literal.FalseLiteral, _) => Literal.FalseLiteral
        case (_, Literal.FalseLiteral) => Literal.FalseLiteral
        case (Literal.TrueLiteral, rr) => rr
        case (ll, Literal.TrueLiteral) => ll
        case (ll, rr) => And(ll, rr)
      }
      case f if f.foldable && f.deterministic &&
          f.dataType == org.apache.spark.sql.types.BooleanType =>
        f.eval(null) match {
          case true => Literal.TrueLiteral
          case false => Literal.FalseLiteral
          case _ => f
        }
      case other => other
    }
    norm(e) == Literal.TrueLiteral
  }

  /** Re-express a resolved expression against a FRESH read of the same
    * table: attribute references unbind to names (the engine verb
    * applies them to its own snapshot scan). Subqueries are SHAPE-
    * CHECKED here (analysis-time, loud) but stay embedded — the
    * command materializes them at RUN time ([[GraftDmlSubqueries]]),
    * so EXPLAIN of a DML statement runs no jobs and the subquery
    * snapshot is the statement's execution, not its analysis.
    */
  private def unbound(e: Expression, where: String): Expression = {
    GraftDmlSubqueries.check(e, where)
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

/** Dynamic `INSERT OVERWRITE <cat>.<ns>.<t> [PARTITION (c)] SELECT …`
  * (round 16) → [[Upsert.overwritePartitions]]: every partition the
  * staged write produced is replaced wholesale, untouched partitions
  * survive, and the swap is ONE optimistic snapshot commit (replaced
  * files retire, new files add — time travel keeps the old slices).
  * The replaced set is derived FROM THE STAGED OUTPUT, so an empty
  * source is a no-op rather than a truncate — the exact hazard
  * static-mode `INSERT OVERWRITE` carries. Identity layouts at any
  * depth (round 16: multi-level replaces LEAF partitions — sibling
  * leaves under the same first-level value survive); hidden-transform
  * layouts refuse loudly (replacing a transform bucket because some
  * rows landed in it would drop the bucket's co-bucketed rows).
  */
final case class GraftDynamicOverwriteCommand(table: GraftTable,
    query: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    val pc = table.partitionCols
    pc match {
      case cols if cols.nonEmpty &&
          !cols.exists(graft.engine.PartitionTransforms.isDerived) =>
        Upsert.overwritePartitionsLayout(session, table.path,
          Shims.ofRows(session, query), cols, expectedValues = None)
      case other => throw new UnsupportedOperationException(
        s"dynamic INSERT OVERWRITE ${table.name()}: the layout " +
          s"${other.mkString("(", ", ", ")")} is " +
          (if (other.isEmpty) "unpartitioned — use static INSERT " +
            "OVERWRITE (whole-table replace)"
           else
             // replacing a TRANSFORM bucket because SOME rows landed
             // in it would silently drop the bucket's unrelated rows
             // (the Iceberg dynamic-overwrite footgun) — refuse;
             // rewrite scope on hidden layouts is MERGE/DELETE
             "transform-derived — dynamic overwrite on hidden " +
               "transform buckets drops co-bucketed rows; use MERGE " +
               "or the library's Upsert verbs"))
    }
    Seq.empty
  }
}

/** `UPDATE <cat>.<ns>.<t> SET … WHERE …` → [[Upsert.updateWhere]]'s
  * touched-files-only snapshot rewrite, or — when the table's DML mode
  * is merge-on-read (round 17) — [[Upsert.updateWhereMor]]'s
  * deletion-vector + append commit. */
final case class GraftUpdateCommand(table: GraftTable, condition: Column,
    set: Map[String, Column]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val where = s"UPDATE ${table.name()}"
    // WHERE may carry oversized membership subqueries (distributed
    // join fallback); SET values stay literal-only — they evaluate
    // inside the rewrite projection, which a join cannot reach
    val prepared = GraftDmlSubqueries.prepare(session, condition, where)
    val assigns = set.map { case (k, v) =>
      k -> GraftDmlSubqueries.materialize(session, v, where) }
    if (Upsert.dmlMode(session, table.path) == "merge-on-read")
      Upsert.updateWhereMor(session, table.path, prepared, assigns)
    else
      Upsert.updateWhere(session, table.path, prepared, assigns)
    Seq.empty
  }
}

/** `DELETE FROM <cat>.<ns>.<t> WHERE <pred with subqueries>` →
  * [[Upsert.deleteWhere]]'s touched-files-only snapshot rewrite — or
  * the deletion-vector commit under merge-on-read (round 17). The
  * subquery-free shapes never get here; they ride the stock
  * SupportsDeleteV2 route, which dispatches on the same mode. */
final case class GraftDeleteCommand(table: GraftTable, condition: Column)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val prepared = GraftDmlSubqueries.prepare(session, condition,
      s"DELETE FROM ${table.name()}")
    if (Upsert.dmlMode(session, table.path) == "merge-on-read")
      Upsert.deleteWhereMor(session, table.path, prepared)
    else
      Upsert.deleteWhere(session, table.path, prepared)
    Seq.empty
  }
}

/** `MERGE INTO <cat>.<ns>.<t> USING src ON keys …` — two engine routes:
  *
  *  - the CANONICAL SCD1 shape (one unconditional `UPDATE SET *` + one
  *    unconditional `INSERT *`) keeps its battle-tested fast path:
  *    partition-wholesale [[Upsert.mergePartitioned]] when the table is
  *    date-partitioned (the partition column must be among the keys) or
  *    [[Upsert.mergeParquet]] otherwise;
  *  - every other accepted shape (conditional clauses, `DELETE`,
  *    insert-only / matched-only merges) runs the generalized
  *    [[Upsert.mergeActions]]: touched-files-only rewrite,
  *    first-match-wins clause resolution, one optimistic snapshot
  *    commit.
  */
final case class GraftMergeCommand(table: GraftTable,
    source: LogicalPlan, keys: Seq[String],
    actions: Seq[Upsert.MatchedAction],
    bySource: Seq[Upsert.BySourceAction],
    insert: Option[(Option[Column], Option[Seq[(String, Column)]])])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val targetCols = table.schema().fieldNames.toSeq
    (actions, bySource, insert) match {
      // SCD1 fast path (partition-wholesale / whole-table staged
      // rewrite) — copy-on-write tables only; a merge-on-read table
      // routes through mergeProgram, whose round-18 DV path turns the
      // same SET * + INSERT * program into O(matched) sidecar rows +
      // appends instead of a partition rewrite
      case (Seq(Upsert.MatchedUpdate(None, assigns)), Seq(),
          Some((None, None)))
          if assigns.isEmpty &&
            Upsert.dmlMode(session, table.path) != "merge-on-read" =>
        val src = Shims.ofRows(session, source)
          .select(targetCols.map(col): _*)
        table.partitionCols match {
          case Seq(dateCol)
              if !graft.engine.PartitionTransforms.isDerived(dateCol) =>
            require(keys.contains(dateCol),
              s"MERGE INTO ${table.name()}: the table is partitioned by " +
                s"'$dateCol', which must be among the merge keys " +
                s"(got ${keys.mkString(", ")})")
            Upsert.mergePartitioned(session, table.path, src, keys, dateCol)
          case Seq() =>
            Upsert.mergeParquet(session, table.path, src, keys)
          case deep =>
            // multi-level identity layouts AND hidden-transform layouts
            // (round 15): the partition-wholesale SCD1 fast path is
            // single-level-identity only (a ptx_* dir is not a logical
            // column, so it can never be a merge key), but the
            // generalized touched-files-only merge handles any layout —
            // SET * + INSERT * restates the same semantics
            Upsert.mergeActions(session, table.path, src, keys,
              Seq(Upsert.MatchedUpdate(None)), Some(None), deep)
        }
      case _ =>
        val where = s"MERGE INTO ${table.name()}"
        def m(c: Column): Column =
          GraftDmlSubqueries.materialize(session, c, where)
        val mat = actions.map {
          case Upsert.MatchedUpdate(c, set) =>
            Upsert.MatchedUpdate(c.map(m),
              set.map { case (k, v) => k -> m(v) })
          case Upsert.MatchedDelete(c) => Upsert.MatchedDelete(c.map(m))
        }
        val bs = bySource.map {
          case Upsert.BySourceUpdate(c, set) =>
            Upsert.BySourceUpdate(c.map(m),
              set.map { case (k, v) => k -> m(v) })
          case Upsert.BySourceDelete(c) => Upsert.BySourceDelete(c.map(m))
        }
        val ins = insert.map { case (c, set) =>
          Upsert.InsertSpec(c.map(m),
            set.map(_.map { case (k, v) => k -> m(v) }))
        }
        Upsert.mergeProgram(session, table.path,
          Shims.ofRows(session, source), keys, mat, bs, ins,
          table.partitionCols)
    }
    Seq.empty
  }
}

/** Run-time materialization of UNCORRELATED subqueries in DML
  * predicates and assignment values (round 15): `key IN (SELECT …)` →
  * an IN-list, a scalar subquery → its single value, uncorrelated
  * EXISTS → a boolean. Runs at COMMAND EXECUTION (not analysis), so
  * EXPLAIN stays side-effect-free and the subquery reads the snapshot
  * current when the statement runs — the same statement-scoped
  * evaluation Postgres gives these shapes (the engine verb then
  * re-resolves the TARGET's snapshot under its writer lease; a commit
  * racing into that sliver serializes after this statement, exactly
  * like a READ-COMMITTED subquery). The literalization is BOUNDED
  * (`spark.graft.dml.subquery.maxRows` default 100k;
  * `spark.graft.dml.exists.maxKeys` default 1M for decorrelated-EXISTS
  * key sets) — below the caps an InSet literal pushes into the parquet
  * scan and prunes row groups, which no join can. PAST the caps
  * (round 17), DELETE and UPDATE predicates route the key set through
  * a DISTRIBUTED membership join ([[prepare]] →
  * [[Upsert.MembershipJoin]]) instead of refusing; only positions a
  * join cannot reach — SET values, MERGE clause conditions — still
  * refuse loudly. Correlated subqueries beyond the equality-EXISTS
  * shape are refused at ANALYSIS time ([[GraftDmlSubqueries.check]]):
  * they need a per-row join the rewrite verbs don't restate.
  */
private[plans] object GraftDmlSubqueries {

  /** Analysis-time shape gate: loud refusals that need no execution.
    * Correlated EXISTS is accepted iff [[decorrelateExists]] can
    * rewrite it (round 16); every other correlated shape still
    * refuses.
    */
  def check(e: Expression, where: String): Unit = e.foreach {
    case InSubquery(values, _) =>
      require(values.size == 1,
        s"$where: multi-column IN subqueries are not supported " +
          "in graft DML")
    case ex: Exists if ex.isCorrelated =>
      require(decorrelateExists(ex).isDefined,
        s"$where: this correlated EXISTS does not decorrelate — the " +
          "supported shape correlates ONLY through top-level `outer " +
          "column = inner expression` equality conjuncts in the " +
          "subquery's WHERE clause, with nothing but projections " +
          "above it; restate anything richer as a MERGE")
    case s: SubqueryExpression =>
      require(!s.isCorrelated,
        s"$where: correlated subqueries are not supported in graft DML " +
          "— restate the per-row match as a MERGE (correlated EXISTS " +
          "with equality correlation is supported)")
    case _ => ()
  }

  private def hasOuter(e: Expression): Boolean =
    e.exists(_.isInstanceOf[OuterReference])

  /** Is `e` an expression over OUTER references and literals only —
    * usable verbatim as the outer side of a semi-join key? (A bare
    * inner attribute is NOT; a deterministic function of outer refs,
    * e.g. `t.k + 1`, IS.)
    */
  private def outerOnly(e: Expression): Boolean = e match {
    case _: OuterReference => true
    case _: AttributeReference => false
    case _: SubqueryExpression => false
    case _: Literal => true
    case _ => e.deterministic && e.children.nonEmpty &&
      e.children.forall(outerOnly)
  }

  /** EXISTS decorrelation (round 16). The idiomatic Postgres
    * `DELETE FROM t WHERE EXISTS (SELECT 1 FROM s WHERE s.k = t.k AND
    * <rest>)` analyzes to `Exists(Project(_, Filter(cond, child)))`
    * with the correlation as `OuterReference` equality conjuncts in
    * that single WHERE. Those conjuncts are semi-join keys: the EXISTS
    * is equivalent to `struct(outerSides) IN (SELECT
    * struct(innerExprs) FROM <subquery minus the correlated
    * conjuncts>)` compared NULL-SAFELY against TRUE (a NULL outer key
    * must read as "no match" — false, not NULL — for NOT EXISTS to
    * complement correctly). The outer side may be any deterministic
    * expression over outer columns (`s.k = t.k + 1` qualifies).
    * Returns (outer-side exprs, inner key projection) or None when
    * the shape is richer (aggregates/limits ABOVE the correlated
    * filter, non-equality correlation, outer refs in projections) —
    * those change existence semantics under this rewrite and refuse.
    * An aggregate BELOW the correlated filter is fine: the filter
    * then tests aggregate rows, which the key projection preserves.
    */
  private[plans] def decorrelateExists(ex: Exists)
      : Option[(Seq[Expression], LogicalPlan)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    def walk(p: LogicalPlan)
        : Option[(Seq[(Expression, Expression)], LogicalPlan)] =
      p match {
        case Project(pl, child) if !pl.exists(hasOuter) => walk(child)
        case SubqueryAlias(_, child) => walk(child)
        case Filter(cond, child) if hasOuter(cond) &&
            !child.exists(_.expressions.exists(hasOuter)) =>
          val (corr, rest) = conjuncts(cond).partition(hasOuter)
          // inner.deterministic (round 17, ADVICE r16): a correlation
          // conjunct like `t.k = rand()` is outer=deterministic-inner
          // in SHAPE, but the rewrite evaluates the inner side ONCE
          // into a shared key set where true EXISTS semantics evaluate
          // it per outer row — refuse loudly instead of silently
          // changing semantics.
          val pairs = corr.map {
            case EqualTo(o, inner)
                if outerOnly(o) && hasOuter(o) && !hasOuter(inner) &&
                  inner.deterministic =>
              Some(o -> inner)
            case EqualTo(inner, o)
                if outerOnly(o) && hasOuter(o) && !hasOuter(inner) &&
                  inner.deterministic =>
              Some(o -> inner)
            case _ => None
          }
          if (pairs.contains(None)) None
          else Some((pairs.flatten,
            rest.reduceOption(
              org.apache.spark.sql.catalyst.expressions.And.apply)
              .map(Filter(_, child)).getOrElse(child)))
        case _ => None
      }
    walk(ex.plan).map { case (pairs, stripped) =>
      (pairs.map(_._1),
        Project(pairs.zipWithIndex.map { case ((_, e), i) =>
          org.apache.spark.sql.catalyst.expressions.Alias(e, s"__k$i")()
        }, stripped))
    }
  }

  def materialize(spark: SparkSession, c: Column, where: String): Column = {
    val (expr, joins) = eval(spark, Shims.expression(c), where,
      allowJoins = false)
    assert(joins.isEmpty)
    Shims.column(expr)
  }

  /** DELETE/UPDATE-WHERE predicate preparation (round 17, lifting the
    * key-set ceiling): like [[materialize]], but a membership subquery
    * whose key set overflows its driver cap is NOT refused — it becomes
    * an [[Upsert.MembershipJoin]] (DISTINCT keys + marker, left-joined
    * by the engine verb) and the predicate reads the marker. Below the
    * caps the literal path is kept deliberately: an InSet literal
    * pushes into the parquet scan and prunes row groups, which a join
    * never does — small key sets are FASTER literalized, big ones only
    * work joined.
    */
  def prepare(spark: SparkSession, c: Column,
      where: String): Upsert.PreparedPredicate = {
    val (expr, joins) = eval(spark, Shims.expression(c), where,
      allowJoins = true)
    Upsert.PreparedPredicate(joins, Shims.column(expr))
  }

  private def eval(spark: SparkSession, e: Expression, where: String,
      allowJoins: Boolean): (Expression, Seq[Upsert.MembershipJoin]) = {
    val joins = scala.collection.mutable.ArrayBuffer
      .empty[Upsert.MembershipJoin]
    // Collect up to `max` rows; None = overflow (the caller routes to
    // the distributed join, or refuses loudly when literals are the
    // only option — SET values and MERGE clause conditions evaluate
    // inside frames the membership join cannot reach).
    def collectUpTo(plan: LogicalPlan, max: Int): Option[Array[Row]] = {
      val rows = Shims.ofRows(spark, plan).limit(max + 1).collect()
      if (rows.length <= max) Some(rows) else None
    }
    def overflow(max: Int, capKey: String): Nothing =
      throw new UnsupportedOperationException(
        s"$where: subquery materialized more than $max rows ($capKey) " +
          "— in this position the key set must literalize; DELETE and " +
          "UPDATE WHERE run oversized key sets as distributed joins, " +
          "and MERGE's semi-join scales arbitrarily")
    def capped(plan: LogicalPlan, max: Int, capKey: String): Array[Row] =
      collectUpTo(plan, max).getOrElse(overflow(max, capKey))
    def maxRows: Int =
      spark.conf.get("spark.graft.dml.subquery.maxRows", "100000").toInt
    // The decorrelated-EXISTS key set gets its OWN, higher cap: DISTINCT
    // keys land on the driver once and the membership test optimizes to
    // an O(1) InSet probe per row. Default lowered 5M → 1M (ADVICE r16:
    // boxed string/struct rows can reach far past the scalar estimate);
    // past it, DELETE/UPDATE predicates route through the distributed
    // membership join instead of refusing.
    def maxKeys: Int =
      spark.conf.get("spark.graft.dml.exists.maxKeys", "1000000").toInt
    var subIdx = -1
    def nextIdx(): Int = { subIdx += 1; subIdx }
    // A key subquery that runs as a JOIN executes once per frame the
    // verb evaluates the predicate against (discovery + rewrite) — a
    // nondeterministic one would name one file set and rewrite another.
    def requireDeterministic(plan: LogicalPlan): Unit =
      require(!plan.exists(_.expressions.exists(!_.deterministic)),
        s"$where: a membership subquery past the literal cap must be " +
          "deterministic — the distributed rewrite evaluates it once " +
          "per predicate application")
    // marker <=> TRUE after the left join: matched → true, unmatched
    // (incl. NULL outer keys, which plain EqualTo never matches) → false
    def existsJoin(keys: org.apache.spark.sql.DataFrame,
        outerCols: Seq[Column], keyCols: Seq[String]): Expression = {
      val i = nextIdx()
      val marker = s"__graft_m$i"
      val renamed = keys.toDF(
        keyCols.indices.map(j => s"__graft_k${i}_$j"): _*)
      val on = outerCols.zipWithIndex
        .map { case (o, j) => o === col(s"__graft_k${i}_$j") }
        .reduce(_ && _)
      joins += Upsert.MembershipJoin(
        renamed.distinct().withColumn(marker, lit(true)), on, marker)
      Shims.expression(col(marker) <=> lit(true))
    }
    val out = e.transformUp {
      case InSubquery(values, lq) =>
        val dt = lq.plan.output.head.dataType
        collectUpTo(lq.plan, maxRows) match {
          case Some(rows) =>
            val items = rows.map(r => Literal.create(r.get(0), dt)).toSeq
            // x IN (empty set) is FALSE for every x, including NULL —
            // and NOT IN over the surrounding Not() then holds for all
            if (items.isEmpty) Literal(false) else In(values.head, items)
          case None if allowJoins =>
            requireDeterministic(lq.plan)
            // IN keeps SQL's three-valued logic, which the marker alone
            // loses: no match reads NULL (not FALSE) when either the
            // probe value is NULL or the key set contains a NULL — a
            // NOT IN above then correctly eliminates every row. The
            // has-NULL fact is one tiny aggregate, not a key collection.
            val q = Shims.ofRows(spark, lq.plan).toDF("__graft_v")
            val st = q.agg(count(lit(1)).as("n"),
              count(col("__graft_v")).as("nn")).head()
            if (st.getLong(0) == 0L) Literal(false)
            else {
              val hasNull = st.getLong(1) < st.getLong(0)
              val v = Shims.column(values.head)
              val marked = Shims.column(existsJoin(q, Seq(v), Seq("k")))
              Shims.expression(
                when(marked, lit(true))
                  .when(v.isNull || lit(hasNull),
                    lit(null).cast("boolean"))
                  .otherwise(lit(false)))
            }
          case None =>
            overflow(maxRows, "spark.graft.dml.subquery.maxRows")
        }
      case s: ScalarSubquery =>
        val rows = capped(s.plan, maxRows,
          "spark.graft.dml.subquery.maxRows")
        require(rows.length <= 1,
          s"$where: scalar subquery returned ${rows.length} rows")
        Literal.create(rows.headOption.map(_.get(0)).orNull,
          s.plan.output.head.dataType)
      case ex: Exists if ex.isCorrelated =>
        // decorrelated membership (round 16): DISTINCT keys of the
        // stripped subquery; <=> TRUE pins the tri-state — EXISTS is
        // never NULL, so a NULL outer key must yield FALSE (and TRUE
        // under NOT EXISTS)
        val (outer, keyPlan) = decorrelateExists(ex).getOrElse(
          throw new UnsupportedOperationException(
            s"$where: this correlated EXISTS does not decorrelate — " +
              "restate it as a MERGE"))
        // outer sides re-expressed by NAME (the engine verb resolves
        // them against its own snapshot scan, the module convention)
        val outerRefs: Seq[Expression] = outer.map(_.transform {
          case OuterReference(a) => UnresolvedAttribute.quoted(a.name)
        })
        val keyTypes = keyPlan.output.map(_.dataType)
        collectUpTo(Distinct(keyPlan), maxKeys) match {
          case Some(rows) if rows.isEmpty => Literal(false)
          case Some(rows) if outer.size == 1 =>
            // single-key literal path: InSet built DIRECTLY from
            // internal values (ADVICE r16 — an In() of millions of
            // Literal nodes is GBs of expression tree before OptimizeIn
            // collapses it; InSet is the end state, build it outright)
            val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
              .createToCatalystConverter(keyTypes.head)
            val hset = rows.iterator.map(r => conv(r.get(0))).toSet
            org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
              org.apache.spark.sql.catalyst.expressions.InSet(
                outerRefs.head, hset), Literal(true))
          case Some(rows) =>
            val st = org.apache.spark.sql.types.StructType(
              keyPlan.output.map(o => org.apache.spark.sql.types
                .StructField(o.name, o.dataType, nullable = true)))
            org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
              In(org.apache.spark.sql.catalyst.expressions.CreateStruct(
                  outerRefs),
                rows.map(r => Literal.create(r, st)).toSeq), Literal(true))
          case None if allowJoins =>
            requireDeterministic(keyPlan)
            existsJoin(Shims.ofRows(spark, keyPlan),
              outerRefs.map(Shims.column), keyPlan.output.map(_.name))
          case None =>
            overflow(maxKeys, "spark.graft.dml.exists.maxKeys")
        }
      case ex: Exists =>
        Literal(Shims.ofRows(spark, ex.plan).limit(1).collect().nonEmpty)
    }
    (out, joins.toSeq)
  }
}
