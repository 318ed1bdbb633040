package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, ShowViews, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{BooleanType, StringType}

import graft.catalog.GraftCatalog

/** SQL surface for PERSISTED views (round 17). Spark 4.1 ships the DSv2
  * [[org.apache.spark.sql.connector.catalog.ViewCatalog]] SPI but NO
  * engine support: `ResolveSessionCatalog` hard-refuses `CREATE VIEW` /
  * `DROP VIEW` / `SHOW VIEWS` on any non-session catalog
  * (`MISSING_CATALOG_ABILITY.VIEWS`), and nothing ever calls
  * `loadView`. So — the same technique Iceberg's Spark extensions use —
  * the statements are intercepted at the PARSER seam before that rule
  * can see them:
  *
  *  - [[GraftViewParser]] wraps the session parser; a parsed
  *    `CreateView`/`DropView`/`ShowViews` whose identifier resolves to a
  *    [[GraftCatalog]] becomes the matching Graft*Command; session-
  *    catalog statements pass through byte-identical.
  *  - [[ResolveGraftViews]] resolves `SELECT … FROM <cat>.<ns>.<view>`:
  *    the stored SQL is re-parsed, its relation names QUALIFIED with
  *    the name-resolution context captured at CREATE (CTE names
  *    excluded), optional column aliases applied, and the expansion
  *    substituted — the analyzer then resolves the expanded tree
  *    against the CURRENT table snapshots, exactly like Postgres view
  *    expansion. Nested views expand on later fixpoint iterations; a
  *    (re-)definition cycle terminates at the analyzer's iteration
  *    cap rather than hanging.
  */
final class GraftViewParser(session: SparkSession,
    delegate: ParserInterface) extends ParserInterface {

  private def graftView(parts: Seq[String])
      : Option[(GraftCatalog, Identifier)] =
    Shims.catalogAndIdentifier(session, parts) match {
      case (g: GraftCatalog, id) => Some((g, id))
      case _ => None
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    // materialized-view DDL first (round 18): the delegate does not
    // PARSE `MATERIALIZED` at all, so recognition must precede it
    GraftMatviewSql.intercept(session, sqlText, delegate).getOrElse(
    delegate.parsePlan(sqlText) match {
      case cv: CreateView => cv.child match {
        case UnresolvedIdentifier(parts, _) =>
          graftView(parts).map[LogicalPlan] { case (g, id) =>
            GraftCreateViewCommand(g, id, cv,
              Shims.currentCatalogName(session),
              Shims.currentNamespace(session).toSeq)
          }.getOrElse(cv)
        case _ => cv
      }
      case dv: DropView => dv.child match {
        case UnresolvedIdentifier(parts, _) =>
          graftView(parts).map[LogicalPlan] { case (g, id) =>
            GraftDropViewCommand(g, id, dv.ifExists)
          }.getOrElse(dv)
        case _ => dv
      }
      case sv: ShowViews => sv.child match {
        case UnresolvedNamespace(parts, _) =>
          val (cat, ns) =
            if (parts.nonEmpty &&
                Shims.isCatalogRegistered(session, parts.head))
              (Shims.catalogPlugin(session, Some(parts.head)), parts.tail)
            else if (parts.nonEmpty)
              (Shims.catalogPlugin(session, None), parts)
            else (Shims.catalogPlugin(session, None),
              Shims.currentNamespace(session).toSeq)
          cat match {
            case g: GraftCatalog =>
              GraftShowViewsCommand(g, ns, sv.pattern)
            case _ => sv
          }
        case _ => sv
      }
      case other => other
    })

  override def parseExpression(s: String): Expression =
    delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseTableSchema(s: String)
      : org.apache.spark.sql.types.StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String)
      : org.apache.spark.sql.types.DataType = delegate.parseDataType(s)
  override def parseRoutineParam(s: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(s)
}

/** `CREATE [OR REPLACE] VIEW <cat>.<ns>.<v> [(cols)] AS <query>` — the
  * query analyzes NOW (definition-time validation + schema capture,
  * like Postgres), but only the TEXT persists; reads re-expand it. */
final case class GraftCreateViewCommand(catalog: GraftCatalog,
    ident: Identifier, cv: CreateView, curCatalog: String,
    curNamespace: Seq[String]) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(cv.query)
  override def run(session: SparkSession): Seq[Row] = {
    val sqlText = cv.originalText.getOrElse(
      throw new UnsupportedOperationException(
        s"CREATE VIEW ${ident}: the parser provided no original query " +
          "text to persist"))
    val analyzed = Shims.ofRows(session, cv.query)
    val schema = analyzed.schema
    val aliases = cv.userSpecifiedColumns.map(_._1)
    require(aliases.isEmpty || aliases.size == schema.size,
      s"CREATE VIEW $ident: ${aliases.size} column aliases for a " +
        s"${schema.size}-column query")
    val comments = cv.userSpecifiedColumns.map(_._2.getOrElse(""))
    val shownSchema =
      if (aliases.isEmpty) schema
      else org.apache.spark.sql.types.StructType(
        schema.fields.zip(aliases).map { case (f, a) => f.copy(name = a) })
    import scala.jdk.CollectionConverters._
    val props = (cv.properties ++
      cv.comment.map("comment" -> _)).asJava
    val info = new ViewInfo(ident, sqlText, curCatalog,
      curNamespace.toArray, shownSchema, schema.fieldNames,
      aliases.toArray, comments.toArray, props)
    if (cv.replace) catalog.replaceView(info, true)
    else if (cv.allowExisting && catalog.viewExists(ident)) ()
    else catalog.createView(info)
    Seq.empty
  }
}

final case class GraftDropViewCommand(catalog: GraftCatalog,
    ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}

final case class GraftShowViewsCommand(catalog: GraftCatalog,
    namespace: Seq[String], pattern: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)(),
    AttributeReference("isTemporary", BooleanType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    // SHOW-style LIKE pattern: '*' any-sequence, '|' alternatives
    val keep: String => Boolean = pattern match {
      case Some(p) =>
        val rx = p.split("\\|").map(alt =>
          java.util.regex.Pattern.quote(alt).replace("*", "\\E.*\\Q"))
          .mkString("(?i)(", ")|(", ")")
        s => s.matches(rx)
      case None => _ => true
    }
    catalog.listViews(namespace: _*).toSeq
      .filter(id => keep(id.name))
      .map(id => Row(id.namespace.mkString("."), id.name, false))
  }
}

/** Read-time view expansion — see the file scaladoc. The expansion is
  * analyzed EAGERLY (the same analysis-time technique as the repo's TVF
  * rules): splicing an unresolved `WITH …` body into the Resolution
  * batch would miss CTE substitution, which only runs in the earlier
  * Substitution batch — a fresh sub-analysis runs every batch against
  * the body. A thread-local expansion stack turns definition cycles
  * (possible via CREATE OR REPLACE) into a loud error instead of
  * unbounded recursion.
  */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation =>
        expand(u.multipartIdentifier).getOrElse(u)
    }

  private def expand(parts: Seq[String]): Option[LogicalPlan] =
    Shims.catalogAndIdentifier(spark, parts) match {
      case (g: GraftCatalog, id) if g.viewExists(id) =>
        val v = g.loadView(id)
        val parsed = spark.sessionState.sqlParser.parseQuery(v.query)
        // CTE-defined names must NOT be qualified — they are local to
        // the view body, not catalog relations
        val ctes: Set[String] = parsed.collect {
          case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
        }.flatten.toSet
        val ctx = v.currentNamespace.toSeq
        val qualified = parsed.transformUpWithSubqueries {
          case r: UnresolvedRelation => r.multipartIdentifier match {
            case Seq(one) if !ctes.contains(one.toLowerCase) =>
              r.copy(multipartIdentifier =
                (v.currentCatalog +: ctx) :+ one)
            case p if p.size > 1 &&
                !Shims.isCatalogRegistered(spark, p.head) =>
              r.copy(multipartIdentifier = v.currentCatalog +: p)
            case _ => r
          }
        }
        val aliased =
          if (v.columnAliases.nonEmpty)
            UnresolvedSubqueryColumnAliases(v.columnAliases.toSeq,
              qualified)
          else qualified
        val key = s"${g.name()}.$id"
        val stack = ResolveGraftViews.expanding.get()
        require(!stack.contains(key), {
          import scala.jdk.CollectionConverters._
          s"recursive view definition: ${stack.iterator().asScala.toSeq
            .reverse.mkString(" -> ")} -> $key"
        })
        stack.push(key)
        val analyzed =
          try Shims.ofRows(spark, aliased).queryExecution.analyzed
          finally stack.pop()
        Some(SubqueryAlias(id.name, analyzed))
      case _ => None
    }
}

object ResolveGraftViews {
  private val expanding =
    new ThreadLocal[java.util.ArrayDeque[String]] {
      override def initialValue(): java.util.ArrayDeque[String] =
        new java.util.ArrayDeque[String]()
    }
}
