package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.{Compaction, Manifest, Publication}

/** SQL-callable warehouse maintenance (round 13): the lease-guarded
  * maintenance verbs — compaction, vacuum, publication-aware warehouse
  * vacuum — exposed as DSv2 stored procedures, so a SQL-only operator
  * runs them as `CALL <cat>.system.compact('ns.table')` with the same
  * snapshot-isolation guarantees as the library calls. The reference's
  * equivalent maintenance (Postgres autovacuum, manual VACUUM/REINDEX)
  * is reachable from any SQL client; this closes that for the lakehouse.
  *
  * Each procedure returns its summary as result rows (a [[LocalScan]]),
  * so `CALL` output is inspectable like any query.
  */
private[catalog] object GraftProcedures {

  /** One side-effecting maintenance procedure: fixed IN parameters,
    * a result schema, and a driver-side body. */
  abstract class GraftProcedure(root: String) extends UnboundProcedure
      with BoundProcedure {
    def run(spark: SparkSession, root: String,
        input: InternalRow): Seq[InternalRow]
    def resultSchema: StructType

    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      // name the captured result distinctly: inside the anonymous scan,
      // a local named `rows` would resolve to the scan's OWN rows()
      // (infinite self-recursion), not the outer val
      val out = run(SparkSession.active, root, input).toArray
      val schema = resultSchema
      java.util.Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = schema
      }).iterator()
    }

    protected def tablePathOf(root: String, qualified: String): String =
      GraftPaths.tablePathOf(root, qualified)
    protected def str(r: InternalRow, i: Int): String =
      if (r.isNullAt(i)) "" else r.getUTF8String(i).toString
    protected def int(r: InternalRow, i: Int, dflt: Int): Int =
      if (r.isNullAt(i)) dflt else r.getInt(i)
    protected def row(vals: Any*): InternalRow =
      new GenericInternalRow(vals.map {
        case s: String => UTF8String.fromString(s)
        case other => other.asInstanceOf[AnyRef]
      }.toArray[Any])
    protected def in(name: String, dt: DataType,
        default: String): ProcedureParameter =
      ProcedureParameter.in(name, dt).defaultValue(default).build()
    protected def in(name: String, dt: DataType): ProcedureParameter =
      ProcedureParameter.in(name, dt).build()
  }

  /** `CALL cat.system.compact('ns.t', target_file_mb => 128,
    * partition_col => 'd', cluster_by => 'k,m', stats_cols => 'k')` —
    * the lease-guarded clustered compaction pass ([[Compaction.compact]]).
    */
  final class CompactProcedure(root: String) extends GraftProcedure(root) {
    override def name(): String = "compact"
    override def description(): String =
      "rewrite a table's live snapshot at target file size " +
        "(optionally range-clustered with stats sidecars); " +
        "snapshot-isolated, lease-guarded"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      in("target_file_mb", IntegerType, "128"),
      in("partition_col", StringType, "''"),
      in("cluster_by", StringType, "''"),
      in("stats_cols", StringType, "''"))
    override def resultSchema: StructType = StructType(Seq(
      StructField("files_before", LongType, nullable = false),
      StructField("files_after", LongType, nullable = false)))
    override def run(spark: SparkSession, root: String,
        input: InternalRow): Seq[InternalRow] = {
      val path = tablePathOf(root, str(input, 0))
      val targetMb = int(input, 1, 128)
      def list(s: String): Seq[String] =
        s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val (before, after) = Compaction.compact(spark, path,
        partitionCol = Some(str(input, 2)).filter(_.nonEmpty),
        targetBytesPerFile = targetMb.toLong * 1024 * 1024,
        statsCols = list(str(input, 4)),
        clusterBy = list(str(input, 3)))
      Seq(row(java.lang.Long.valueOf(before), java.lang.Long.valueOf(after)))
    }
  }

  /** `CALL cat.system.vacuum('ns.t', keep => 2)` — retire manifest
    * versions beyond the newest `keep` and delete unreferenced data
    * files. REFUSED once the warehouse has publications — per-table
    * vacuum could delete a version a publication still pins; use
    * `vacuum_warehouse` then.
    */
  final class VacuumProcedure(root: String) extends GraftProcedure(root) {
    override def name(): String = "vacuum"
    override def description(): String =
      "retire old manifest versions of one table and delete " +
        "unreferenced files (refused once publications exist — " +
        "use vacuum_warehouse)"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      in("keep", IntegerType, "2"),
      in("retain_hours", IntegerType, "0"))
    override def resultSchema: StructType = StructType(Seq(
      StructField("files_deleted", LongType, nullable = false)))
    override def run(spark: SparkSession, root: String,
        input: InternalRow): Seq[InternalRow] = {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(!fs.exists(
        new org.apache.hadoop.fs.Path(root, "_graft_publication")),
        "this warehouse publishes: per-table vacuum could delete a " +
          "version a publication pins — CALL system.vacuum_warehouse " +
          "instead")
      val n = Manifest.vacuum(spark, tablePathOf(root, str(input, 0)),
        keep = int(input, 1, 2),
        retainMillis = int(input, 2, 0).toLong * 3600 * 1000)
      Seq(row(java.lang.Long.valueOf(n.toLong)))
    }
  }

  /** `CALL cat.system.history('ns.t')` — the table's commit history
    * (version, commit instant, live-file count, file diff, txn
    * markers): the `DESCRIBE HISTORY` surface for a SQL-only operator
    * deciding vacuum retention or a time-travel target.
    */
  final class HistoryProcedure(root: String) extends GraftProcedure(root) {
    override def name(): String = "history"
    override def description(): String =
      "commit history of a table: version, commit time, file counts, " +
        "file diff vs previous, streaming txn markers"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType))
    override def resultSchema: StructType = StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = false),
      StructField("n_files", IntegerType, nullable = false),
      StructField("added", IntegerType, nullable = false),
      StructField("retired", IntegerType, nullable = false),
      StructField("txns", StringType, nullable = false)))
    override def run(spark: SparkSession, root: String,
        input: InternalRow): Seq[InternalRow] =
      Manifest.history(spark, tablePathOf(root, str(input, 0))).map { h =>
        row(java.lang.Long.valueOf(h.version),
          java.lang.Long.valueOf(h.committedAtMillis * 1000L), // micros
          java.lang.Integer.valueOf(h.nFiles),
          java.lang.Integer.valueOf(h.added),
          java.lang.Integer.valueOf(h.retired),
          h.txns.toSeq.sortBy(_._1)
            .map { case (a, b) => s"$a=$b" }.mkString(","))
      }
  }

  /** `CALL cat.system.vacuum_warehouse(keep_pubs => 2, keep_tables => 2)`
    * — the publication-aware vacuum: retired publications are unlisted
    * FIRST, then every pinned table vacuums protecting exactly the
    * versions retained publications still name.
    */
  final class VacuumWarehouseProcedure(root: String) extends GraftProcedure(root) {
    override def name(): String = "vacuum_warehouse"
    override def description(): String =
      "publication-aware vacuum across the warehouse: protects every " +
        "version a retained publication pins"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("keep_pubs", IntegerType, "2"),
      in("keep_tables", IntegerType, "2"))
    override def resultSchema: StructType = StructType(Seq(
      StructField("publications_deleted", LongType, nullable = false),
      StructField("files_deleted", LongType, nullable = false)))
    override def run(spark: SparkSession, root: String,
        input: InternalRow): Seq[InternalRow] = {
      val (pubs, files) = Publication.vacuumWarehouse(spark, root,
        keepPubs = int(input, 0, 2), keepTables = int(input, 1, 2))
      Seq(row(java.lang.Long.valueOf(pubs.toLong),
        java.lang.Long.valueOf(files.toLong)))
    }
  }

  /** `CALL cat.system.ann_reindex(source_path => '…', index_root => '…',
    * if_staler_than => 2.0)` — the ANN staleness response (round 17):
    * when the index's corpus has grown past `if_staler_than` × its
    * build size (the measured frozen-geometry under-fit point,
    * SCALE.md round 16), rebuild a fresh generation with the persisted
    * spec and atomically swap the generation pointer
    * ([[graft.engine.AnnIndex.reindex]]). Default threshold 0.0 =
    * unconditional (an explicit CALL means "do it"). ANN indexes are
    * PATH-addressed (they version alongside their corpus snapshot, not
    * inside the catalog namespace), so the parameters take paths.
    */
  final class AnnReindexProcedure(root: String) extends GraftProcedure(root) {
    override def name(): String = "ann_reindex"
    override def description(): String =
      "rebuild an ANN index into a fresh generation and swap the " +
        "pointer when its corpus has grown past if_staler_than x the " +
        "build size (0.0 = always); lease-guarded, probe-continuous"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("source_path", StringType),
      in("index_root", StringType),
      in("if_staler_than", DoubleType, "0.0D"))
    override def resultSchema: StructType = StructType(Seq(
      StructField("staleness_before", DoubleType, nullable = false),
      StructField("reindexed", BooleanType, nullable = false),
      StructField("vectors", LongType, nullable = false),
      StructField("current_root", StringType, nullable = false)))
    override def run(spark: SparkSession, root: String,
        input: InternalRow): Seq[InternalRow] = {
      val (src, idx) = (str(input, 0), str(input, 1))
      val thr = if (input.isNullAt(2)) 0.0 else input.getDouble(2)
      val before = graft.engine.AnnIndex.stats(spark, idx)
      val done = graft.engine.AnnIndex.reindexIfStale(spark, src, idx, thr)
      Seq(row(java.lang.Double.valueOf(before.staleness),
        java.lang.Boolean.valueOf(done.isDefined),
        java.lang.Long.valueOf(done.getOrElse(0L)),
        graft.engine.AnnIndex.currentRoot(spark, idx)))
    }
  }

  /** `CALL cat.system.maintain(table => 'ns.t', ann_source_path => …,
    * ann_index_root => …, ann_staleness => 0.5)` — ONE maintenance
    * verb bundling the self-healing passes (round 18, closing the
    * "reindex is a procedure, not a policy" gap): auto-compaction with
    * its small-file AND deletion-vector-debt policies
    * ([[Compaction.autoCompact]] — the DV dimension absorbs
    * merge-on-read delete trickle before the broadcast cap refuses),
    * plus — when an ANN index rides the table — a staleness-gated
    * generation rebuild ([[graft.engine.AnnIndex.reindexIfStale]],
    * conservative default 0.5 = rebuild once the corpus outgrew the
    * build by 50%). Idempotent and cheap when nothing trips: the
    * decisions are metadata-only reads.
    */
  final class MaintainProcedure(root: String) extends GraftProcedure(root) {
    override def name(): String = "maintain"
    override def description(): String =
      "bundled self-healing maintenance: auto-compact (small files + " +
        "deletion-vector debt) and staleness-gated ANN reindex"
    override def parameters(): Array[ProcedureParameter] = Array(
      in("table", StringType),
      in("ann_source_path", StringType, "''"),
      in("ann_index_root", StringType, "''"),
      in("ann_staleness", DoubleType, "0.5D"))
    override def resultSchema: StructType = StructType(Seq(
      StructField("compacted", BooleanType, nullable = false),
      StructField("files_before", LongType, nullable = false),
      StructField("files_after", LongType, nullable = false),
      StructField("ann_reindexed", BooleanType, nullable = false),
      StructField("ann_vectors", LongType, nullable = false)))
    override def run(spark: SparkSession, root: String,
        input: InternalRow): Seq[InternalRow] = {
      val path = tablePathOf(root, str(input, 0))
      val compacted = Compaction.autoCompact(spark, path)
      val (annSrc, annIdx) = (str(input, 1), str(input, 2))
      val thr = if (input.isNullAt(3)) 0.5 else input.getDouble(3)
      require(annSrc.isEmpty == annIdx.isEmpty,
        "maintain: ann_source_path and ann_index_root come together")
      val reindexed =
        if (annIdx.isEmpty) None
        else graft.engine.AnnIndex.reindexIfStale(spark, annSrc, annIdx,
          thr)
      Seq(row(java.lang.Boolean.valueOf(compacted.isDefined),
        java.lang.Long.valueOf(compacted.map(_._1).getOrElse(0L)),
        java.lang.Long.valueOf(compacted.map(_._2).getOrElse(0L)),
        java.lang.Boolean.valueOf(reindexed.isDefined),
        java.lang.Long.valueOf(reindexed.getOrElse(0L))))
    }
  }

  val names: Seq[String] =
    Seq("compact", "vacuum", "vacuum_warehouse", "history", "ann_reindex",
      "maintain")

  /** A fresh instance bound to `root` — procedures carry no state
    * beyond the warehouse root they act on (one per catalog). */
  def load(name: String, root: String): Option[GraftProcedure] =
    name match {
      case "compact" => Some(new CompactProcedure(root))
      case "vacuum" => Some(new VacuumProcedure(root))
      case "vacuum_warehouse" => Some(new VacuumWarehouseProcedure(root))
      case "history" => Some(new HistoryProcedure(root))
      case "ann_reindex" => Some(new AnnReindexProcedure(root))
      case "maintain" => Some(new MaintainProcedure(root))
      case _ => None
    }
}
