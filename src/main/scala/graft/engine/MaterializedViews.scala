package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Automatic aggregate rewrite onto a MATERIALIZED VIEW — the missing
  * half of incremental maintenance: [[Incremental.refresh]] keeps a
  * mart cheap to MAINTAIN, and this makes it free to USE — a query
  * that re-states the mart's defining computation over the SOURCE is
  * answered from the mart, turning a 100 TB fact scan into a read of
  * the (typically MB-sized) aggregate. The reference gets this by
  * convention (analysts are told to query the DM tables, not the DDS
  * fact); here the ENGINE recognizes the computation and routes it,
  * so the convention cannot be violated by accident.
  *
  * Matching is by PLAN SHAPE, not text: the registered `compute` is
  * re-planned over the source's CURRENT snapshot (cached on the source
  * fingerprint), scans are normalized to their file lists, expression
  * ids are canonicalized away, and any query subtree whose normalized
  * shape + scanned files equal the definition's is substituted with a
  * manifest read of the mart, column-mapped by name onto the subtree's
  * own output attributes — the enclosing query never knows.
  *
  * SAFETY: the rewrite fires only when the mart is FRESH — its
  * [[Incremental]] bookmark equals the source's current manifest
  * version. A stale mart (source advanced, refresh not yet run) simply
  * stops matching and the query pays the honest source scan; answers
  * are never wrong, only sometimes slower. And because the definition
  * is re-planned against the current snapshot's file list, a query
  * over time-travelled or differently-filtered data can never
  * false-match.
  */
object MaterializedViews {

  final case class Mv(name: String, sourcePath: String, martPath: String,
      compute: DataFrame => DataFrame)

  private val registry =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Mv]

  /** Cache of the definition's normalized (shape, scan file lists),
    * keyed on the source fingerprint — a source commit invalidates it.
    */
  private val shapeCache =
    new SessionKeyedCache[(LogicalPlan, Seq[Seq[String]])]

  /** Guard against self-recursion: building the definition plan inside
    * the rule re-enters the analyzer (and so the rule).
    */
  private val expanding = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  def register(spark: SparkSession, name: String, sourcePath: String,
      martPath: String)(compute: DataFrame => DataFrame): Unit = {
    registry.keys.filter(_._1.sparkContext.isStopped).foreach(registry.remove)
    registry.put((spark, name), Mv(name, sourcePath, martPath, compute)); ()
  }

  def deregister(spark: SparkSession, name: String): Unit = {
    registry.remove((spark, name)); ()
  }

  private[engine] def active(spark: SparkSession): Seq[Mv] =
    registry.collect { case ((s, _), mv) if s eq spark => mv }.toSeq
      .sortBy(_.name)

  /** Normalize a plan for shape comparison: every file scan becomes a
    * [[LocalRelation]] placeholder (its FILE LIST captured separately —
    * [[HadoopFsRelation]] has reference equality, so raw canonicalized
    * trees never compare equal across separately-built reads), then
    * canonicalize to erase expression ids. Two plans are the same
    * computation iff both the normalized tree and the ordered scan
    * file lists match.
    */
  private def shape(plan: LogicalPlan): (LogicalPlan, Seq[Seq[String]]) = {
    val scans = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val normalized = plan.transformUp {
      case lr @ LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
        scans += h.location.inputFiles.sorted.toSeq
        LocalRelation(lr.output)
    }
    (normalized.canonicalized, scans.toSeq)
  }

  private def fresh(spark: SparkSession, mv: Mv): Boolean =
    Incremental.appliedSourceVersion(spark, mv.martPath).exists(v =>
      Manifest.currentVersion(spark, mv.sourcePath).contains(v))

  /** The analysis rule (registered in GraftExtensions). Per MV: skip
    * unless fresh; build (cached) the definition's shape over the
    * current snapshot; substitute every matching resolved subtree with
    * a mart read whose columns are aliased back onto the subtree's own
    * output attribute ids, so references above never dangle.
    */
  case class RewriteToMv(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val mvs = active(spark)
      if (mvs.isEmpty || expanding.get()) plan
      else mvs.foldLeft(plan)(rewriteOne)
    }

    private def rewriteOne(plan: LogicalPlan, mv: Mv): LogicalPlan = {
      // cheap structural precheck before ANY metadata I/O: the plan
      // must scan files under the MV's source at all (the analyzer
      // calls resolution rules to fixpoint on every query — queries
      // that never touch the source should pay a tree walk, not reads)
      val prefix = new org.apache.hadoop.fs.Path(mv.sourcePath)
        .toUri.getPath.stripSuffix("/") + "/"
      val touchesSource = plan.exists {
        case LogicalRelation(h: HadoopFsRelation, _, _, _, _) =>
          h.location.rootPaths.exists(
            _.toUri.getPath.startsWith(prefix))
        case _ => false
      }
      if (!touchesSource) return plan
      if (!fresh(spark, mv)) return plan
      expanding.set(true)
      try {
        val (defShape, defScans) = shapeCache.getOrElseUpdate(spark,
          s"mv:${mv.name}",
          SessionKeyedCache.fileFingerprint(spark, mv.sourcePath))(
          shape(mv.compute(Manifest.read(spark, mv.sourcePath))
            .queryExecution.analyzed))
        val mart = Manifest.read(spark, mv.martPath)
          .queryExecution.analyzed
        val martByName: Map[String, Attribute] =
          mart.output.map(a => a.name -> a).toMap
        plan.transformUp {
          case sub if sub.resolved && !sub.isInstanceOf[LocalRelation] &&
              sub.output.forall(a => martByName.get(a.name)
                .exists(_.dataType == a.dataType)) && {
                val (s, scans) = shape(sub)
                s == defShape && scans == defScans
              } =>
            Project(sub.output.map(a =>
              Alias(martByName(a.name), a.name)(exprId = a.exprId)), mart)
        }
      } finally expanding.set(false)
    }
  }
}
