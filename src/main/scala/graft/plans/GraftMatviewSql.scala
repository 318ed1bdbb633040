package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftshim.Shims

import graft.catalog.{GraftCatalog, GraftMatviews, GraftPaths}
import graft.engine.{Incremental, Manifest, MaterializedViews}

/** SQL DDL for MATERIALIZED VIEWS (round 18 — verdict ask #4): the
  * engine-side machinery is round 12's [[MaterializedViews]] (plan-
  * shape rewrite) + [[Incremental]] (bookmark refresh), but a BI user
  * could reach it only from Scala. Spark's parser does not parse
  * `MATERIALIZED` at all, so — one seam deeper than round 17's view
  * interception, which caught statements the parser PARSES but the
  * engine refuses — these statements are recognized BEFORE delegation
  * ([[GraftViewParser]] calls [[GraftMatviewSql.intercept]]):
  *
  * {{{
  *   CREATE [OR REPLACE] MATERIALIZED VIEW [IF NOT EXISTS]
  *     <cat>.<ns>.<mv> [PARTITIONED BY (<col>)] AS <select>;
  *   REFRESH MATERIALIZED VIEW <cat>.<ns>.<mv>;
  *   DROP MATERIALIZED VIEW [IF EXISTS] <cat>.<ns>.<mv>;
  * }}}
  *
  * Semantics (the Postgres matview contract, plus freshness-gated
  * auto-rewrite Postgres doesn't have):
  *
  *  - CREATE materializes NOW: the defining SELECT (which must read
  *    exactly ONE graft table — [[Incremental]]'s per-partition
  *    refresh is single-source) runs in full and lands as an ordinary
  *    manifest-managed table at the matview's own identifier, so
  *    `SELECT * FROM <cat>.<ns>.<mv>` works through the standard
  *    table surface (DESCRIBE, time travel, the lot);
  *  - the definition document persists beside the mart
  *    ([[GraftMatviews]]), and every session lazily re-arms the
  *    rewrite from it ([[LoadGraftMatviews]]) — a query restating the
  *    definition over the SOURCE is answered from the mart while
  *    fresh, falls back to the honest source scan when stale;
  *  - REFRESH re-runs [[Incremental.refresh]]: only source partitions
  *    whose file sets changed since the bookmark recompute;
  *  - DROP removes the definition, the registration, and the mart
  *    table.
  *
  * `PARTITIONED BY` names the refresh-scoping partition column; when
  * omitted it derives from the source table's single identity
  * partition column. The definition must project that column through
  * (per-partition decomposability — checked at CREATE, loudly).
  */
object GraftMatviewSql {

  private val CreateRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?MATERIALIZED\s+VIEW\s+""" +
      """(IF\s+NOT\s+EXISTS\s+)?([\w.`]+)\s*""" +
      """(?:PARTITIONED\s+BY\s*\(\s*(\w+)\s*\)\s*)?AS\s+(.+?)\s*;?\s*$""").r
  private val RefreshRe =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s*;?\s*$""".r
  private val DropRe =
    ("""(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?""" +
      """([\w.`]+)\s*;?\s*$""").r

  /** Recognize a matview statement; None = not one (delegate parses).
    * A matview statement naming a non-graft catalog refuses HERE with
    * the real reason — the delegate would throw an unhelpful
    * `MATERIALIZED` syntax error.
    */
  def intercept(session: SparkSession, sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = sqlText match {
    case CreateRe(replace, ifNotExists, ident, dateCol, query) =>
      val (g, id) = graftTarget(session, delegate, ident)
      Some(GraftCreateMatviewCommand(g, id, query.trim,
        Option(dateCol), replace != null, ifNotExists != null,
        Shims.currentCatalogName(session),
        Shims.currentNamespace(session).toSeq))
    case RefreshRe(ident) =>
      val (g, id) = graftTarget(session, delegate, ident)
      Some(GraftRefreshMatviewCommand(g, id))
    case DropRe(ifExists, ident) =>
      val (g, id) = graftTarget(session, delegate, ident)
      Some(GraftDropMatviewCommand(g, id, ifExists != null))
    case _ => None
  }

  private def graftTarget(session: SparkSession, delegate: ParserInterface,
      ident: String): (GraftCatalog, Identifier) =
    Shims.catalogAndIdentifier(session,
      delegate.parseMultipartIdentifier(ident)) match {
      case (g: GraftCatalog, id) => (g, id)
      case (other, _) => throw new UnsupportedOperationException(
        s"materialized views require a graft catalog; '$ident' " +
          s"resolves to catalog '${other.name()}'")
    }

  /** Qualify the definition's relation names with the captured
    * name-resolution context — the identical discipline as
    * [[ResolveGraftViews]] (CTE-local names excluded).
    */
  private[plans] def qualify(spark: SparkSession, parsed: LogicalPlan,
      curCatalog: String, curNamespace: Seq[String]): LogicalPlan = {
    val ctes: Set[String] = parsed.collect {
      case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
    }.flatten.toSet
    parsed.transformUpWithSubqueries {
      case r: UnresolvedRelation => r.multipartIdentifier match {
        case Seq(one) if !ctes.contains(one.toLowerCase) =>
          r.copy(multipartIdentifier = (curCatalog +: curNamespace) :+ one)
        case p if p.size > 1 && !Shims.isCatalogRegistered(spark, p.head) =>
          r.copy(multipartIdentifier = curCatalog +: p)
        case _ => r
      }
    }
  }

  /** The definition's single source table: every relation the
    * (qualified) plan references must resolve to the SAME graft
    * table. Returns (catalog, identifier, table path).
    */
  private[plans] def resolveSource(spark: SparkSession, qualified: LogicalPlan)
      : (GraftCatalog, Identifier, String) = {
    val rels = qualified.collectWithSubqueries {
      case r: UnresolvedRelation => r.multipartIdentifier
    }.distinct
    require(rels.nonEmpty,
      "materialized view definition reads no table")
    val resolved = rels.map(p => Shims.catalogAndIdentifier(spark, p))
    val paths = resolved.map {
      case (g: GraftCatalog, id) =>
        require(id.namespace.length == 1,
          s"materialized view source must be <catalog>.<ns>.<table>, " +
            s"got ${id.namespace.mkString(".")}.${id.name}")
        (g, id, GraftPaths.tablePath(g.warehouseRoot,
          id.namespace.head, id.name))
      case (other, id) => throw new UnsupportedOperationException(
        s"materialized view definitions may only read graft tables; " +
          s"'${id.name}' resolves to catalog '${other.name()}'")
    }
    require(paths.map(_._3).distinct.size == 1,
      "materialized view definitions are single-source (the " +
        "incremental refresh scopes by the source's changed " +
        s"partitions); this one reads ${paths.map(_._3).distinct.size} " +
        s"tables: ${paths.map(_._3).distinct.mkString(", ")}")
    paths.head
  }

  /** The registration's compute function: re-parse the stored SELECT,
    * qualify it in its captured context, and substitute EVERY source
    * relation with the caller's DataFrame — so the refresh's filtered
    * source ([[Incremental.refresh]] passes the changed-partition
    * slice) and the rewrite's shape probe both flow through the same
    * text.
    */
  private[plans] def computeFn(spark: SparkSession,
      doc: GraftMatviews.MatviewDoc): DataFrame => DataFrame = src => {
    val parsed = spark.sessionState.sqlParser.parseQuery(doc.sql)
    val qualified = qualify(spark, parsed, doc.currentCatalog,
      doc.currentNamespace)
    val srcParts =
      (doc.sourceCatalog +: doc.sourceNamespace) :+ doc.sourceTable
    val substituted = qualified.transformUpWithSubqueries {
      case r: UnresolvedRelation
          if r.multipartIdentifier.map(_.toLowerCase) ==
            srcParts.map(_.toLowerCase) =>
        SubqueryAlias(doc.sourceTable, src.queryExecution.logical)
    }
    Shims.ofRows(spark, substituted)
  }

  /** Arm [[MaterializedViews]]'s rewrite + refresh for one persisted
    * matview in this session. Idempotent (keyed registry put).
    */
  private[plans] def register(spark: SparkSession, g: GraftCatalog,
      id: Identifier, doc: GraftMatviews.MatviewDoc): Unit = {
    val srcRoot = spark.conf
      .getOption(s"spark.sql.catalog.${doc.sourceCatalog}.root")
      .getOrElse(throw new IllegalStateException(
        s"materialized view ${g.name()}.$id: source catalog " +
          s"'${doc.sourceCatalog}' is not registered in this session"))
    val srcPath = GraftPaths.tablePath(srcRoot,
      doc.sourceNamespace.mkString("/"), doc.sourceTable)
    val martPath = GraftPaths.tablePath(g.warehouseRoot,
      id.namespace.mkString("/"), id.name)
    MaterializedViews.register(spark, fullName(g, id), srcPath, martPath)(
      computeFn(spark, doc))
  }

  private[plans] def fullName(g: GraftCatalog, id: Identifier): String =
    s"${g.name()}.${id.namespace.mkString(".")}.${id.name}"

  private[plans] def martPathOf(g: GraftCatalog, id: Identifier): String =
    GraftPaths.tablePath(g.warehouseRoot, id.namespace.mkString("/"),
      id.name)

  // ---- lazy per-session re-arm of persisted matviews ----------------

  private val loaded =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession,
        java.lang.Boolean]())

  /** Scan every registered graft catalog's namespaces for persisted
    * matview docs and register them — once per session (flagged), so a
    * FRESH session's first query gets the rewrite without anyone
    * calling CREATE/REFRESH first. Cost: one namespace listing + one
    * doc dir listing per catalog, once.
    */
  def ensureLoaded(spark: SparkSession): Unit = {
    if (!loaded.add(spark)) return
    val catRe = """spark\.sql\.catalog\.([\w-]+)""".r
    spark.conf.getAll.foreach {
      case (catRe(cat), cls) if cls == classOf[GraftCatalog].getName =>
        try {
          Shims.catalogPlugin(spark, Some(cat)) match {
            case g: GraftCatalog =>
              g.listNamespaces().foreach { ns =>
                g.listMatviews(ns.toSeq).foreach { id =>
                  g.readMatview(id).foreach(register(spark, g, id, _))
                }
              }
            case _ => ()
          }
        } catch {
          // a misconfigured catalog must not poison every query's
          // analysis — the CREATE/REFRESH commands surface real errors
          case _: Exception => ()
        }
      case _ => ()
    }
  }
}

/** Analysis-rule shim that re-arms persisted matviews before
  * [[MaterializedViews.RewriteToMv]] can run — a no-op tree-identity
  * rule after the once-per-session load.
  */
case class LoadGraftMatviews(spark: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    GraftMatviewSql.ensureLoaded(spark)
    plan
  }
}

/** `CREATE [OR REPLACE] MATERIALIZED VIEW … AS SELECT` — validate,
  * persist the definition, arm the rewrite, and materialize NOW (the
  * Postgres contract: the matview is queryable the moment CREATE
  * returns).
  */
final case class GraftCreateMatviewCommand(catalog: GraftCatalog,
    ident: Identifier, selectSql: String, dateColOpt: Option[String],
    replace: Boolean, ifNotExists: Boolean, curCatalog: String,
    curNamespace: Seq[String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val exists = catalog.matviewExists(ident)
    if (exists && ifNotExists) return Seq.empty
    require(!exists || replace,
      s"materialized view ${GraftMatviewSql.fullName(catalog, ident)} " +
        "already exists (use CREATE OR REPLACE, or DROP it first)")
    require(exists || !catalog.tableExists(ident),
      s"a table named ${GraftMatviewSql.fullName(catalog, ident)} " +
        "already exists — one relation namespace, like Postgres")
    require(!catalog.viewExists(ident),
      s"a view named ${GraftMatviewSql.fullName(catalog, ident)} " +
        "already exists — one relation namespace, like Postgres")
    val parsed = session.sessionState.sqlParser.parseQuery(selectSql)
    val (srcCat, srcId, srcPath) = GraftMatviewSql.resolveSource(session,
      GraftMatviewSql.qualify(session, parsed, curCatalog, curNamespace))
    require(Manifest.currentVersion(session, srcPath).nonEmpty,
      s"materialized view source ${srcId.name} ($srcPath) is not a " +
        "manifest-managed table")
    // the refresh-scoping column: explicit, else the source's single
    // identity partition column
    val dateCol = dateColOpt.getOrElse {
      val parts = srcCat.loadTable(srcId) match {
        case t: graft.catalog.GraftTable => t.partitionCols
        case _ => Seq.empty
      }
      parts match {
        case Seq(one) if !graft.engine.PartitionTransforms.isDerived(one) =>
          one
        case other => throw new IllegalArgumentException(
          "CREATE MATERIALIZED VIEW: cannot derive the refresh " +
            s"partition column from the source's layout ($other) — " +
            "declare it with PARTITIONED BY (<col>)")
      }
    }
    val doc = GraftMatviews.MatviewDoc(selectSql, curCatalog,
      curNamespace, srcCat.name(), srcId.namespace.toSeq, srcId.name,
      dateCol)
    // definition-time validation: analyze the compute over the current
    // source snapshot and check the partition column projects through
    val probe = GraftMatviewSql.computeFn(session, doc)(
      Manifest.read(session, srcPath))
    require(probe.columns.contains(dateCol),
      s"CREATE MATERIALIZED VIEW: the definition must project the " +
        s"refresh partition column '$dateCol' through (columns: " +
        s"${probe.columns.mkString(", ")})")
    catalog.writeMatview(ident, doc)
    GraftMatviewSql.register(session, catalog, ident, doc)
    // materialize now — full first build, bookmarked at the source's
    // current version ([[Incremental.refresh]] first-run path; REPLACE
    // over an existing mart recomputes from scratch)
    val martPath = GraftMatviewSql.martPathOf(catalog, ident)
    Incremental.refresh(session, srcPath, martPath, dateCol)(
      GraftMatviewSql.computeFn(session, doc))
    Seq.empty
  }
}

final case class GraftRefreshMatviewCommand(catalog: GraftCatalog,
    ident: Identifier) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val doc = catalog.readMatview(ident).getOrElse(
      throw new IllegalArgumentException(
        s"materialized view " +
          s"${GraftMatviewSql.fullName(catalog, ident)} does not exist"))
    GraftMatviewSql.register(session, catalog, ident, doc)
    val srcRoot = session.conf
      .getOption(s"spark.sql.catalog.${doc.sourceCatalog}.root").get
    val srcPath = GraftPaths.tablePath(srcRoot,
      doc.sourceNamespace.mkString("/"), doc.sourceTable)
    Incremental.refresh(session, srcPath,
      GraftMatviewSql.martPathOf(catalog, ident), doc.dateCol)(
      GraftMatviewSql.computeFn(session, doc))
    Seq.empty
  }
}

final case class GraftDropMatviewCommand(catalog: GraftCatalog,
    ident: Identifier, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val existed = catalog.dropMatview(ident)
    if (!existed && !ifExists)
      throw new IllegalArgumentException(
        s"materialized view " +
          s"${GraftMatviewSql.fullName(catalog, ident)} does not exist")
    if (existed) {
      MaterializedViews.deregister(session,
        GraftMatviewSql.fullName(catalog, ident))
      // the mart data table drops through the standard catalog verb
      if (catalog.tableExists(ident)) catalog.dropTable(ident)
      ()
    }
    Seq.empty
  }
}
