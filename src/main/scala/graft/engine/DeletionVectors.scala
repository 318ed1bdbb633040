package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Positional deletion vectors — the MERGE-ON-READ half of the DML
  * story (round 17). Every row-level verb so far is copy-on-write:
  * a DELETE that matches ten rows in a 1 GB file rewrites the whole
  * gigabyte ([[Upsert.rewriteMatching]]). That is the right trade for
  * scan-heavy tables, but at 100 TB a GDPR-style trickle of tiny
  * deletes (10 rows/file across a million files) turns O(matched) work
  * into O(table) writes. The merge-on-read alternative — what Delta
  * calls deletion vectors and Iceberg calls position deletes — records
  * the POSITIONS of deleted rows in a sidecar and applies them at read
  * time, deferring the rewrite to compaction:
  *
  *  - a DV object is one small parquet file under
  *    `_graft_manifest/dv/` holding `(file STRING, pos BIGINT)` rows,
  *    where `file` is the data file's QUALIFIED URI (the
  *    `_metadata.file_path` string — see below) and `pos` its parquet
  *    row index (`_metadata.row_index` — file-absolute; row-group
  *    skipping does not shift it);
  *  - the manifest's `#dv <relFile>=<dvRel>:<rows>` header lines bind
  *    each data file to the DV object holding its complete deleted-
  *    position set. The pointer rides INSIDE the atomically-renamed
  *    list, so a delete commits exactly like any other snapshot swap
  *    (time travel, optimistic conflicts, and CDC all see it);
  *  - reads split the snapshot's files into clean and DV'd: clean
  *    files scan exactly as before (ZERO overhead — no join, no
  *    metadata columns, same whole-stage codegen), DV'd files scan
  *    with `_metadata.file_path`/`row_index` captured and a BROADCAST
  *    left-anti join against the DV rows, then union back;
  *  - any rewrite that retires a file (COW DML, compaction, Z-order,
  *    overwrite) drops its pointer automatically — pointers are
  *    carried forward only for files still in the committed list, and
  *    rewritten files always have new names. Compaction is therefore
  *    the ABSORB verb: it reads DV-applied rows and lands clean files.
  *
  * Scale contract: the anti-join side is the table's TOTAL live DV
  * row set for the scanned files, broadcast to every executor — so it
  * is capped (`spark.graft.dml.dv.maxRows`, default 10M rows ≈ low
  * hundreds of MB) and a delete that would push past the cap refuses
  * loudly, naming compaction (absorb) or copy-on-write as the outs.
  * That is the honest boundary: a DV set big enough to shuffle is a
  * table overdue for its rewrite anyway.
  *
  * Position matching joins on the file's QUALIFIED URI STRING exactly
  * as `_metadata.file_path` renders it — captured at delete time from
  * the same expression the read side compares against, so the
  * representation is consistent by construction (Spark qualifies every
  * scan path through the filesystem, so table-path spelling variations
  * normalize away). Basenames were the first design and are NOT
  * unique: one write task emits the same `part-00000-<uuid>` name into
  * every partition directory it touches (a DeletionVectorSpec seed
  * found the collision on first contact). The manifest-relative
  * mapping for `#dv` pointer keys decodes the URI percent-escapes
  * through the same helper every rewrite verb uses
  * ([[Upsert.scannedFileToRel]], the round-15 space-in-partition-value
  * lesson). A DV object referenced by one file's pointer may carry
  * rows of OTHER files (one object per statement); that is sound
  * because per-file deletion sets only GROW while the file name lives
  * — applying a stale object's rows is applying deletions that
  * already happened.
  *
  * Reference tie-in: the reference's DELETEs are Postgres heap
  * deletes — O(matched) dead tuples reclaimed by autovacuum
  * (`sql/ddl_ods.sql`, the ON CONFLICT family). Merge-on-read restates
  * exactly that cost model for immutable parquet: O(matched) sidecar
  * rows now, the heap rewrite deferred to the vacuum-analogue
  * (compaction).
  */
object DeletionVectors {

  /** Subdirectory of the manifest dir holding DV objects. Lives under
    * `_graft_manifest/` so the data-file walker
    * ([[Manifest.listDataFiles]]) and partition inference never see
    * DV parquet as table data.
    */
  val SubDir = "dv"

  /** DV rows: data-file qualified URI + deleted row index. */
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  /** Reserved scan-side column names for position capture. */
  val FilePathCol = "__graft_dv_fpath"
  val RowIndexCol = "__graft_dv_pos"

  def maxRows(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.dml.dv.maxRows")
      .map(_.toLong).getOrElse(10L * 1000 * 1000)

  /** Write one DV object holding `rows` (schema [[Schema]]) and return
    * its table-relative path. Single-file by construction (the rows
    * are cap-bounded); lands under the manifest dir via tmp+rename so
    * a crash leaves only an unreferenced orphan for [[reclaim]].
    */
  def write(spark: SparkSession, path: String, rows: DataFrame): String = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dvDir = new Path(new Path(path, "_graft_manifest"), SubDir)
    fs.mkdirs(dvDir)
    val stagingRel = s"_staging_${java.util.UUID.randomUUID()}"
    val staging = new Path(dvDir, stagingRel)
    rows.select(col("file").cast(StringType), col("pos").cast(LongType))
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = fs.listStatus(staging).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).getOrElse(
        throw new IllegalStateException(
          s"deletion-vector write into $path produced no parquet part " +
            s"under $staging"))
    val name = s"dv-${java.util.UUID.randomUUID()}.parquet"
    val fin = new Path(dvDir, name)
    if (!fs.rename(part, fin))
      throw new java.io.IOException(
        s"deletion-vector publish failed: $part -> $fin")
    fs.delete(staging, true)
    s"_graft_manifest/$SubDir/$name"
  }

  /** All rows of the given DV objects (deduplicated). No per-file
    * filter: rows of files outside the scanned subset never match the
    * anti-join, and rows of a re-pointed file in an older shared
    * object are a subset of its current set (deletion sets only grow
    * per live file name) — harmless either way.
    */
  def readRows(spark: SparkSession, path: String,
      dvRels: Seq[String]): DataFrame = {
    val abs = dvRels.distinct.map(d => s"$path/$d")
    spark.read.schema(Schema).parquet(abs: _*)
  }

  /** Apply deletion vectors to a snapshot read. `raw` scans a file
    * subset (pre-projection, so `_metadata` still resolves). Clean
    * files take `raw` untouched — zero overhead; DV'd files capture
    * (file_path, row_index) and broadcast-anti-join the DV rows. When
    * `keepPositions`, the two position columns ([[FilePathCol]],
    * [[RowIndexCol]]) survive on the result for BOTH branches — the
    * merge-on-read writers' discovery scan.
    */
  def applyTo(spark: SparkSession, path: String, relFiles: Seq[String],
      dvs: Map[String, Manifest.DvPointer],
      raw: Seq[String] => DataFrame,
      keepPositions: Boolean = false): DataFrame = {
    val (dvd, clean) = relFiles.partition(dvs.contains)
    def positions(df: DataFrame): DataFrame = df
      .withColumn(FilePathCol, col("_metadata.file_path"))
      .withColumn(RowIndexCol, col("_metadata.row_index"))
    def guarded(df: DataFrame): DataFrame = {
      val cols = df.columns.toSet
      require(!cols(FilePathCol) && !cols(RowIndexCol),
        s"deletion-vector read of $path: data columns collide with " +
          s"the reserved position names $FilePathCol/$RowIndexCol")
      positions(df)
    }
    if (dvd.isEmpty) {
      if (keepPositions) guarded(raw(relFiles)) else raw(relFiles)
    } else {
      val dvRows = readRows(spark, path, dvd.map(f => dvs(f).rel))
        .select(col("file").as("__graft_dv_file"),
          col("pos").as("__graft_dv_del"))
      val scanned = guarded(raw(dvd))
      val killed = scanned.join(broadcast(dvRows),
        scanned(FilePathCol) === dvRows("__graft_dv_file") &&
          scanned(RowIndexCol) === dvRows("__graft_dv_del"),
        "left_anti")
      val dvSide =
        if (keepPositions) killed else killed.drop(FilePathCol, RowIndexCol)
      if (clean.isEmpty) dvSide
      else {
        val cleanSide =
          if (keepPositions) guarded(raw(clean)) else raw(clean)
        cleanSide.unionByName(dvSide)
      }
    }
  }

  /** Delete DV objects referenced by NO retained version — vacuum's
    * DV sweep — plus any orphaned `_staging_*` directory a crashed
    * [[write]] left behind (a committed object is always a renamed-out
    * plain FILE, so a staging DIRECTORY still present here is by
    * definition unreferenced; vacuum holds the writer lease, and every
    * DV writer stages under that same lease, so none can be in
    * flight). Returns the number reclaimed.
    */
  def reclaim(spark: SparkSession, path: String,
      liveDvRels: Set[String]): Int = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dvDir = new Path(new Path(path, "_graft_manifest"), SubDir)
    if (!fs.exists(dvDir)) 0
    else {
      val entries = fs.listStatus(dvDir)
      val dead = entries.filter(_.isFile).map(_.getPath)
        .filterNot(p => liveDvRels(s"_graft_manifest/$SubDir/${p.getName}"))
      dead.foreach(p => fs.delete(p, false))
      val orphanStaging = entries.filter(s =>
        s.isDirectory && s.getPath.getName.startsWith("_staging_"))
        .map(_.getPath)
      orphanStaging.foreach(p => fs.delete(p, true))
      dead.length + orphanStaging.length
    }
  }
}
