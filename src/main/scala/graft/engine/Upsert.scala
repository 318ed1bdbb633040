package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** `ON CONFLICT DO NOTHING` as a library — the reference's entire
  * idempotency story (`transformed_from_s3_to_pg.py:146-151`,
  * `from_ods_to_dds_pg.py:50,63,80,101`; unique keys `ddl_ods.sql:23`,
  * `ddl_dds.sql:4,10,18,31`) restated as read-existing → left-anti on the
  * natural key → append (SURVEY §2.3 J5, §7.4.2).
  *
  * Guarantees: re-running any layer is a no-op (the replay contract the
  * reference gets from Postgres unique indexes). Non-goals: concurrent
  * writers — the reference serializes writers through Airflow sensors,
  * and we assume the same single-writer discipline; a transactional table
  * format would make the append atomic.
  *
  * Scale notes: only the KEY COLUMNS of the existing table are read for
  * the anti-join (column pruning reaches the parquet scan), and the
  * anti-join shuffles on the key — no driver-side key collection, no
  * broadcast of the (potentially huge) target. With a date-partitioned
  * target, scoping the read to the incoming dates turns the existing-side
  * scan into partition pruning.
  */
object Upsert {

  /** Rows of `incoming` whose natural key is absent from `existing` —
    * first-wins within `incoming` itself is the caller's concern (see
    * `OdsBuilder.toOds`). NULL-SAFE on every key column: a plain
    * `Seq`-key anti-join never matches NULL = NULL, so a row with a NULL
    * key component (e.g. a rank that failed its cast) would be
    * re-appended on every replay, breaking the idempotency contract.
    */
  def newRows(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame = {
    val ex = existing.select(keys.map(k => col(k).as(s"__ex_$k")): _*)
    val cond = keys.map(k => incoming(k) <=> ex(s"__ex_$k")).reduce(_ && _)
    incoming.join(ex, cond, "left_anti")
  }

  /** Idempotent append of `incoming` into the parquet table at `path`,
    * keyed by `keys`. Returns the number of rows actually appended.
    * Flat (unpartitioned) layout.
    */
  def upsertParquet(spark: SparkSession, path: String, incoming: DataFrame,
      keys: Seq[String]): Long = WriterLease.withLease(spark, path) {
    val toAppend =
      if (tableExists(spark, path)) {
        val existing = spark.read.parquet(path)
        requireSameColumns(incoming, existing, path)
        newRows(incoming, existing, keys)
      } else incoming
    stagedAppend(spark, path, toAppend, None)
  }

  /** Schema drift is REJECTED, not absorbed: parquet appends with a
    * different column set OR different column types leave a table whose
    * read-back schema depends on which file's footer the reader samples
    * (mergeSchema is off by default) — silent nondeterminism. The
    * warehouse contract (§1.3) is a fixed schema per table; widen it
    * with an explicit migration, not an append. Column ORDER may differ
    * (parquet resolves by name) and nullability may differ (a
    * file-level property, not a footer conflict).
    */
  private def requireSameColumns(incoming: DataFrame, existing: DataFrame,
      path: String): Unit = {
    val in = incoming.schema.map(f => f.name -> f.dataType).toMap
    val ex = existing.schema.map(f => f.name -> f.dataType).toMap
    val onlyIn = (in.keySet -- ex.keySet).toSeq.sorted
    val onlyEx = (ex.keySet -- in.keySet).toSeq.sorted
    require(onlyIn.isEmpty && onlyEx.isEmpty,
      s"schema drift on upsert into $path: incoming has ${onlyIn.mkString("[", ",", "]")} " +
        s"not in the table, table has ${onlyEx.mkString("[", ",", "]")} not incoming")
    val retyped = in.keySet.filter(k => in(k) != ex(k)).toSeq.sorted
      .map(k => s"$k: ${in(k).simpleString} vs table ${ex(k).simpleString}")
    require(retyped.isEmpty,
      s"schema drift on upsert into $path: column types differ — ${retyped.mkString("; ")}")
  }

  /** Date-partitioned variant (S7): `partitionBy(dateCol)` makes every
    * run-date predicate downstream a partition-pruned scan (SURVEY §4
    * date-scoping row), and lets the existing-side read prune to just the
    * incoming dates.
    */
  def upsertPartitioned(spark: SparkSession, path: String, incoming: DataFrame,
      keys: Seq[String], dateCol: String): Long = {
    // Pruning the existing side to incoming dates is only sound when the
    // date participates in the natural key (true for ODS and fact:
    // `ddl_ods.sql:23`, `ddl_dds.sql:31`).
    require(keys.contains(dateCol),
      s"partitioned upsert requires the date column '$dateCol' in the key $keys")
    WriterLease.withLease(spark, path) {
      val toAppend =
        if (tableExists(spark, path)) {
          val dates = incoming.select(col(dateCol)).distinct()
          // Existing side pruned to the dates present in this batch — at
          // scale this is the difference between scanning one day and the
          // whole history.
          val table = spark.read.parquet(path)
          requireSameColumns(incoming, table, path)
          val existing = table.join(dates, Seq(dateCol), "left_semi")
          newRows(incoming, existing, keys)
        } else incoming
      stagedAppend(spark, path, toAppend, Some(dateCol))
    }
  }

  /** SCD Type-1 merge: `ON CONFLICT DO UPDATE` semantics — incoming
    * rows REPLACE existing rows with the same natural key; unmatched
    * existing rows survive. The reference only ever needs DO NOTHING
    * (its feed is append-only per key), but a warehouse restatement
    * needs both conflict policies; the Type-2 (versioning) shape is the
    * `q_scd2` query.
    *
    * Implementation: only the date partitions present in `incoming` are
    * rewritten (existing-minus-matching ∪ incoming, staged then swapped
    * per partition), so merge cost is O(touched partitions), not
    * O(table). Each swap parks the previous partition aside and restores
    * it if the swap fails — no window where a partition's surviving rows
    * exist only in a dir a failure path deletes. Duplicate natural keys
    * WITHIN `incoming` are rejected up front (Postgres DO UPDATE raises
    * "cannot affect row a second time"; silently writing both copies
    * would break the table's unique-key contract). Idempotent: replaying
    * the same batch rewrites the same partitions to the same content.
    * Single-writer, like everything in this module. Returns the number
    * of incoming rows merged (counted before any target mutation — the
    * incoming plan may read the target table itself).
    */
  def mergePartitioned(spark: SparkSession, path: String, incoming: DataFrame,
      keys: Seq[String], dateCol: String): Long = {
    require(keys.contains(dateCol),
      s"partitioned merge requires the date column '$dateCol' in the key $keys")
    // pre-mutation guards: both run against an untouched target
    val nIncoming = incoming.count()
    val dupKeys = incoming.groupBy(keys.map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    require(dupKeys.isEmpty,
      s"merge into $path: incoming affects the key ${dupKeys.head.toSeq.init.mkString("(", ",", ")")} more than once")
    WriterLease.withLease(spark, path) {
      if (!tableExists(spark, path)) {
        stagedAppend(spark, path, incoming, Some(dateCol))
        nIncoming
      } else {
        val table = spark.read.parquet(path)
        requireSameColumns(incoming, table, path)
        // null-safe date match: a NULL-date incoming row must pull the
        // existing NULL partition into `kept`, or its surviving rows would
        // be overwritten by the __HIVE_DEFAULT_PARTITION__ swap below
        val dates = incoming.select(col(dateCol).as("__m_date")).distinct()
        val touched =
          table.join(dates, col(dateCol) <=> col("__m_date"), "left_semi")
        val kept = newRows(touched, incoming, keys) // existing rows NOT replaced
        val merged = kept.unionByName(incoming.select(table.columns.map(col): _*))
        val stagingPath = s"$path.__merge_staging"
        merged.write.mode("overwrite").partitionBy(dateCol).parquet(stagingPath)
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        try {
          val stagedParts =
            fs.listStatus(new org.apache.hadoop.fs.Path(stagingPath))
              .filter(_.isDirectory).map(_.getPath)
              .filter(_.getName.startsWith(s"$dateCol="))
          stagedParts.foreach { part =>
            val target = new org.apache.hadoop.fs.Path(path, part.getName)
            val old = new org.apache.hadoop.fs.Path(path, part.getName + ".__old")
            fs.delete(old, true)
            val hadPrevious = fs.exists(target)
            if (hadPrevious && !fs.rename(target, old))
              throw new java.io.IOException(
                s"merge swap failed: $target -> $old (target intact)")
            if (!fs.rename(part, target)) {
              if (hadPrevious && !fs.rename(old, target))
                throw new java.io.IOException(
                  s"merge swap failed AND restore failed — recover manually from $old")
              throw new java.io.IOException(s"merge swap failed: $part -> $target " +
                (if (hadPrevious) "(previous restored)" else "(partition absent; re-run)"))
            }
            fs.delete(old, true)
          }
          nIncoming
        } finally {
          fs.delete(new org.apache.hadoop.fs.Path(stagingPath), true); ()
        }
      }
    }
  }

  /** Materialize the delta to a STAGING DIRECTORY, then append from that.
    * The delta's plan reads the target it is about to write; a cache
    * (`persist` + `count`) is NOT a barrier — a lost cached partition
    * recomputes its lineage against the half-appended target and
    * corrupts the delta mid-write. A durably written staging copy makes
    * the append's input independent of the target.
    */
  private def stagedAppend(spark: SparkSession, path: String,
      delta: DataFrame, dateCol: Option[String]): Long = {
    val stagingPath = s"$path.__delta_staging"
    delta.write.mode("overwrite").parquet(stagingPath)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val staged = spark.read.parquet(stagingPath)
      val n = staged.count()
      if (n > 0) {
        val w = staged.write.mode("append")
        dateCol.fold(w)(c => w.partitionBy(c)).parquet(path)
      }
      n
    } finally {
      fs.delete(new org.apache.hadoop.fs.Path(stagingPath), true); ()
    }
  }

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
