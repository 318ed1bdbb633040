package graft.engine

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** JDBC warehouse sink — the relational-landing half of the reference's
  * contract: every transformed table there ends in Postgres
  * (`dags/transformed_from_s3_to_pg.py:143-152`, psycopg2
  * `execute_values` INSERTs). The engine's system of record stays
  * date-partitioned parquet (the scale-correct choice), and this sink
  * publishes mart slices OUT to any JDBC warehouse with the same
  * idempotent-per-date semantics the parquet writes have: delete the
  * date's rows, then append — a replay never duplicates (which the
  * reference's raw INSERTs do on re-run; SURVEY §7.4.5).
  *
  * Scale: `df.write.jdbc` writes from the EXECUTORS, one connection per
  * partition (`numPartitions`/`batchsize` options control fan-in); the
  * driver only issues the date-delete. Marts are date-scoped aggregates
  * (tiny relative to facts), which is exactly why a row-store landing
  * is viable for them and not for the fact table.
  */
object JdbcSink {

  /** Publish one mart's date slice. Creates the table on first publish
    * (Spark's JDBC Append mode maps the schema); subsequent publishes
    * of the same date replace that date's rows and leave other dates
    * untouched.
    */
  def publishMart(df: DataFrame, url: String, table: String,
      dateCol: String, date: java.sql.Date,
      props: java.util.Properties = new java.util.Properties): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      if (tableExistsJdbc(conn, table)) {
        val del = conn.prepareStatement(
          s"""DELETE FROM $table WHERE "$dateCol" = ?""")
        try { del.setDate(1, date); del.executeUpdate(); () }
        finally del.close()
      }
    } finally conn.close()
    df.write.mode("append").jdbc(url, table, props)
  }

  /** EXACTLY-ONCE epoch-keyed publish — the `foreachBatch` contract.
    *
    * `foreachBatch` is at-least-once: after a failure the SAME batchId
    * is re-run, so a plain append duplicates and even [[publishMart]]'s
    * delete-then-append can interleave with a crash. This publish is
    * transactional and keyed by (table, batchId) in a `graft_epochs`
    * ledger table: inside ONE JDBC transaction it (1) skips committed
    * batchIds, (2) replaces the batch's slices (the rows whose
    * `sliceCols` tuples appear in the batch — for an update-mode
    * windowed aggregate this must be the FULL grouping key, since a
    * batch re-emits only the changed groups and a coarser slice would
    * delete untouched neighbors), (3) inserts the rows, and
    * (4) records the batchId. The ledger's PRIMARY KEY doubles as the
    * race referee: two writers racing the same epoch serialize on the
    * key, the loser rolls back — the MVCC guarantee the reference gets
    * from Postgres, restated for the streaming path.
    *
    * The batch lands via one driver connection, not executor-parallel
    * `df.write.jdbc` — deliberately: a transaction spans one
    * connection, and a STREAMING mart batch is a per-trigger aggregate
    * slice (bounded by construction; `maxRows` makes the assumption
    * loud). The batch path ([[publishMart]]) keeps executor-parallel
    * writes for big backfills.
    *
    * @return true iff this call committed the batch (false = replay of
    *         an already-committed epoch, a no-op)
    */
  def publishEpoch(df: DataFrame, url: String, table: String,
      sliceCols: Seq[String], batchId: Long,
      props: java.util.Properties = new java.util.Properties,
      maxRows: Int = 1 << 20): Boolean = {
    val schema = df.schema
    require(sliceCols.nonEmpty &&
        sliceCols.forall(schema.fieldNames.contains),
      s"publishEpoch: slice columns $sliceCols not all in ${schema.fieldNames.mkString(",")}")
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"publishEpoch into $table: batch exceeds $maxRows rows — this path " +
        "is for per-trigger mart slices; use publishMart for backfills")
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      ensureTable(conn, "graft_epochs",
        "tbl VARCHAR(128) NOT NULL, batch BIGINT NOT NULL, " +
          "PRIMARY KEY (tbl, batch)")
      val seen = conn.prepareStatement(
        "SELECT 1 FROM graft_epochs WHERE tbl = ? AND batch = ?")
      val committed =
        try {
          seen.setString(1, table); seen.setLong(2, batchId)
          val rs = seen.executeQuery()
          try rs.next() finally rs.close()
        } finally seen.close()
      if (committed) { conn.rollback(); false }
      else {
        ensureTable(conn, table, schema.fields.map(f =>
          s""""${f.name}" ${ddlType(f.dataType)}""").mkString(", "))
        val sliceVals = rows
          .map(r => sliceCols.map(c => r.getAs[Any](c))).distinct
        if (sliceVals.nonEmpty) {
          val del = conn.prepareStatement(s"DELETE FROM $table WHERE " +
            sliceCols.map(c => s""""$c" = ?""").mkString(" AND "))
          try sliceVals.foreach { tuple =>
            tuple.zipWithIndex.foreach { case (v, i) =>
              del.setObject(i + 1, v) }
            del.executeUpdate()
          } finally del.close()
        }
        val ins = conn.prepareStatement(
          s"INSERT INTO $table (${schema.fieldNames.map("\"" + _ + "\"").mkString(", ")}) " +
            s"VALUES (${schema.fields.map(_ => "?").mkString(", ")})")
        try {
          rows.foreach { r =>
            schema.fields.zipWithIndex.foreach { case (f, i) =>
              val v = r.get(i)
              if (v == null) ins.setNull(i + 1, sqlType(f.dataType))
              else ins.setObject(i + 1, v)
            }
            ins.addBatch()
          }
          ins.executeBatch()
        } finally ins.close()
        val mark = conn.prepareStatement(
          "INSERT INTO graft_epochs (tbl, batch) VALUES (?, ?)")
        try { mark.setString(1, table); mark.setLong(2, batchId)
          mark.executeUpdate(); () }
        finally mark.close()
        conn.commit()
        true
      }
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: java.sql.SQLException => }
        throw e
    } finally conn.close()
  }

  /** The replica's applied source version, from the transactional
    * offset ledger — the SOURCE OF TRUTH for where a CDC sync resumes
    * (a file-side bookmark could diverge from the replica after a
    * crash; this one is committed in the same transaction as the rows
    * it describes, so it cannot).
    */
  def readOffset(url: String, table: String,
      props: java.util.Properties = new java.util.Properties): Option[Long] = {
    val conn = DriverManager.getConnection(url, props)
    try {
      ensureTable(conn, "graft_cdc_offsets",
        "tbl VARCHAR(128) NOT NULL, ver BIGINT NOT NULL, PRIMARY KEY (tbl)")
      val st = conn.prepareStatement(
        "SELECT ver FROM graft_cdc_offsets WHERE tbl = ?")
      try {
        st.setString(1, table)
        val rs = st.executeQuery()
        try { if (rs.next()) Some(rs.getLong(1)) else None }
        finally rs.close()
      } finally st.close()
    } finally conn.close()
  }

  /** Apply one CDC change batch ([[ChangeFeed]] rows) to a JDBC replica
    * of the source table, EXACTLY ONCE — the transactional
    * offset-commit idiom: the applied-version offset lives in the SAME
    * transaction as the row changes, so the replica and its resume
    * point cannot diverge (a crash either commits both or neither; a
    * replay of a committed range is a detected no-op; a feed computed
    * from a stale offset is a loud error, because net-change semantics
    * are only valid against the exact snapshot the replica is at).
    *
    * In ONE transaction: (1) CAS the offset `fromVersion → toVersion`
    * in `graft_cdc_offsets` (PRIMARY KEY serializes racing writers;
    * the loser rolls back), (2) DELETE every key appearing in the
    * batch, (3) INSERT the `insert` and `update_postimage` rows.
    * Driver-side bounded like [[publishEpoch]] (`maxRows` loud guard —
    * replicas synced this way are dim/mart-sized; the fact table's
    * system of record stays parquet).
    *
    * @return true iff this call applied the batch (false = replay of an
    *         already-applied range)
    */
  def applyChanges(feed: DataFrame, url: String, table: String,
      keyCols: Seq[String], fromVersion: Option[Long], toVersion: Long,
      props: java.util.Properties = new java.util.Properties,
      maxRows: Int = 1 << 20): Boolean = {
    val changeCol = ChangeFeed.ChangeCol
    val schema = feed.schema
    require(keyCols.nonEmpty && keyCols.forall(schema.fieldNames.contains),
      s"applyChanges: key columns $keyCols not all in " +
        schema.fieldNames.mkString(","))
    require(schema.fieldNames.contains(changeCol),
      s"applyChanges: feed has no $changeCol column — not a change feed")
    val rows = feed.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"applyChanges into $table: batch exceeds $maxRows rows — this " +
        "path replicates dim/mart-sized tables; backfill big tables " +
        "in parquet and re-seed the replica")
    val dataFields = schema.fields.filterNot(_.name == changeCol)
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      ensureTable(conn, "graft_cdc_offsets",
        "tbl VARCHAR(128) NOT NULL, ver BIGINT NOT NULL, PRIMARY KEY (tbl)")
      val current = {
        val st = conn.prepareStatement(
          "SELECT ver FROM graft_cdc_offsets WHERE tbl = ?")
        try {
          st.setString(1, table)
          val rs = st.executeQuery()
          try { if (rs.next()) Some(rs.getLong(1)) else None }
          finally rs.close()
        } finally st.close()
      }
      if (current.exists(_ >= toVersion)) { conn.rollback(); false }
      else if (current != fromVersion)
        throw new IllegalStateException(
          s"applyChanges into $table: feed computed from version " +
            s"$fromVersion but the replica is at $current — recompute " +
            "the feed from the replica's own offset")
      else {
        fromVersion match {
          case Some(v) =>
            val up = conn.prepareStatement(
              "UPDATE graft_cdc_offsets SET ver = ? WHERE tbl = ? AND ver = ?")
            try {
              up.setLong(1, toVersion); up.setString(2, table)
              up.setLong(3, v)
              require(up.executeUpdate() == 1,
                s"applyChanges into $table: lost the offset race")
            } finally up.close()
          case None =>
            val ins = conn.prepareStatement(
              "INSERT INTO graft_cdc_offsets (tbl, ver) VALUES (?, ?)")
            try { ins.setString(1, table); ins.setLong(2, toVersion)
              ins.executeUpdate(); () }
            finally ins.close()
        }
        ensureTable(conn, table, dataFields.map(f =>
          s""""${f.name}" ${ddlType(f.dataType)}""").mkString(", "))
        val keyTuples = rows
          .map(r => keyCols.map(c => r.getAs[Any](c))).distinct
        if (keyTuples.nonEmpty) {
          val del = conn.prepareStatement(s"DELETE FROM $table WHERE " +
            keyCols.map(c => s""""$c" = ?""").mkString(" AND "))
          try keyTuples.foreach { tuple =>
            tuple.zipWithIndex.foreach { case (v, i) =>
              del.setObject(i + 1, v) }
            del.executeUpdate()
          } finally del.close()
        }
        val ins = conn.prepareStatement(
          s"INSERT INTO $table (${dataFields.map("\"" + _.name + "\"").mkString(", ")}) " +
            s"VALUES (${dataFields.map(_ => "?").mkString(", ")})")
        try {
          rows.filter { r =>
            val t = r.getAs[String](changeCol)
            t == "insert" || t == "update_postimage"
          }.foreach { r =>
            dataFields.zipWithIndex.foreach { case (f, i) =>
              val v = r.getAs[Any](f.name)
              if (v == null) ins.setNull(i + 1, sqlType(f.dataType))
              else ins.setObject(i + 1, v)
            }
            ins.addBatch()
          }
          ins.executeBatch()
        } finally ins.close()
        conn.commit()
        true
      }
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: java.sql.SQLException => }
        throw e
    } finally conn.close()
  }

  /** Existence probe under the database's own identifier folding:
    * Derby stores unquoted names UPPER, Postgres stores them lower —
    * a fixed-case probe misses on the other family, and the caller
    * then re-issues CREATE TABLE into an already-exists failure. Probe
    * the fold the driver reports, falling back to trying both.
    */
  private def tableExistsJdbc(conn: Connection, table: String): Boolean = {
    val md = conn.getMetaData
    val candidates: Seq[String] =
      if (md.storesUpperCaseIdentifiers)
        Seq(table.toUpperCase(java.util.Locale.ROOT))
      else if (md.storesLowerCaseIdentifiers)
        Seq(table.toLowerCase(java.util.Locale.ROOT))
      else Seq(table, table.toUpperCase(java.util.Locale.ROOT),
        table.toLowerCase(java.util.Locale.ROOT)).distinct
    // getTables treats its table argument as a SEARCH PATTERN: '_'
    // (ubiquitous in these names) is a single-char wildcard, so an
    // unescaped probe for daily_rev would also match daily0rev and
    // silently skip CREATE TABLE. Escape with the driver's own escape
    // string (empty/null → no escaping supported; probe raw).
    val esc = Option(md.getSearchStringEscape).getOrElse("")
    def literal(name: String): String =
      if (esc.isEmpty) name
      else name.replace(esc, esc + esc)
        .replace("_", esc + "_").replace("%", esc + "%")
    candidates.exists { name =>
      val rs = md.getTables(null, null, literal(name), null)
      try rs.next() finally rs.close()
    }
  }

  private def ensureTable(conn: Connection, table: String,
      columnsDdl: String): Unit = {
    if (!tableExistsJdbc(conn, table)) {
      val st = conn.createStatement()
      try { st.executeUpdate(s"CREATE TABLE $table ($columnsDdl)"); () }
      finally st.close()
    }
  }

  /** Mart-surface type mapping (ANSI names Derby and Postgres share);
    * anything else is a loud error, not a guess.
    */
  private def ddlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case StringType => "VARCHAR(4000)"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case BooleanType => "BOOLEAN"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"publishEpoch: no JDBC DDL mapping for ${other.simpleString}")
  }

  private def sqlType(dt: DataType): Int = dt match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case ShortType => java.sql.Types.SMALLINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.REAL
    case StringType => java.sql.Types.VARCHAR
    case DateType => java.sql.Types.DATE
    case TimestampType => java.sql.Types.TIMESTAMP
    case BooleanType => java.sql.Types.BOOLEAN
    case _: DecimalType => java.sql.Types.DECIMAL
    case _ => java.sql.Types.NULL
  }
}
