package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Manifest, Upsert}

/** The DSv2 catalog (`graft.catalog.GraftCatalog`): name-based SQL over
  * manifest-managed tables. Covers the verbs the oracle-gated
  * `q_sql_catalog*` queries don't: library-written partitioned tables
  * resolving by name, partition-pruned + stats-skipped SQL scans,
  * ALTER TABLE ADD COLUMN, TRUNCATE, RENAME, DROP TABLE / CASCADE
  * namespace drops, read-only `VERSION AS OF` snapshots, and the
  * refusal paths (untranslatable DELETE, INSERT OVERWRITE, schema
  * drift on first insert into a CREATE TABLE'd shell).
  */
class CatalogSpec extends AnyFunSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.tcat", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tcat.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tcat.ns")
    r
  }

  private val d1 = Date.valueOf("2024-07-01")
  private val d2 = Date.valueOf("2024-07-02")

  /** The final physical plan — under AQE the top node is adaptive and
    * its real plan only exists after execution, so run the query first.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  private def parquetFilesScanned(
      df: org.apache.spark.sql.DataFrame): Seq[Array[String]] =
    // `collect` from AdaptiveSparkPlanHelper — descends into the
    // materialized query stages AQE hides behind leaf nodes
    collect(finalPlan(df)) {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s.scan
    }.collect {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.fileIndex.inputFiles
    }

  private def seedPartitioned(name: String): String = {
    val p = s"$root/ns/$name"
    Upsert.upsertPartitioned(spark, p,
      Seq((1, d1, 100L), (2, d1, 200L), (3, d2, 300L), (4, d2, 400L))
        .toDF("k", "d", "cents"), Seq("k", "d"), "d")
    p
  }

  test("library-written partitioned table resolves by name; partition filter prunes") {
    seedPartitioned("lib_t")
    val df = spark.sql(
      "SELECT k, cents FROM tcat.ns.lib_t WHERE d = DATE'2024-07-01' ORDER BY k")
    assert(df.as[(Int, Long)].collect().toSeq === Seq((1, 100L), (2, 200L)))
    // the partition predicate must reach the scan as a partition filter
    // (pruned at planning), not survive as a post-scan row filter
    val scans = collect(finalPlan(df)) {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s.scan
    }.collect {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan => p
    }
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      "expected the date predicate to be planned as a partition filter")
  }

  test("SQL INSERT INTO a partitioned table lands through the manifest append") {
    val p = seedPartitioned("ins_t")
    val v1 = Manifest.currentVersion(spark, p).get
    // DSv2 table schema is data columns then partition columns: (k, cents, d)
    spark.sql(
      "INSERT INTO tcat.ns.ins_t VALUES (5, 500, DATE'2024-07-02')")
    assert(Manifest.currentVersion(spark, p).get === v1 + 1)
    assert(spark.sql("SELECT sum(cents) FROM tcat.ns.ins_t")
      .as[Long].head() === 1500L)
    // landed INTO the partition layout, not as a flat file
    assert(Manifest.currentLive(spark, p)
      .exists(f => f.startsWith("d=2024-07-02/") && {
        val pre = Manifest.filesAsOf(spark, p, v1).toSet; !pre(f)
      }))
  }

  test("CREATE TABLE shell: first INSERT validates against the pinned schema") {
    spark.sql("CREATE TABLE tcat.ns.shell (k BIGINT, v STRING)")
    val p = s"$root/ns/shell"
    // empty shell is SELECTable with the pinned shape
    assert(spark.sql("SELECT * FROM tcat.ns.shell").columns.toSeq ===
      Seq("k", "v"))
    assert(spark.sql("SELECT * FROM tcat.ns.shell").count() === 0L)
    // drift against the pinned schema is rejected on the FIRST insert
    val e = intercept[Exception] {
      Upsert.append(spark, p, Seq((1L, 2L)).toDF("k", "other"), None)
    }
    assert(e.getMessage.contains("schema drift"))
    // the documented flow works
    spark.sql("INSERT INTO tcat.ns.shell VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT count(*) FROM tcat.ns.shell")
      .as[Long].head() === 2L)
  }

  test("DELETE FROM translates predicates; untranslatable ones are refused loudly") {
    spark.sql("CREATE TABLE tcat.ns.del_t (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO tcat.ns.del_t VALUES (1,'a'), (2,'b'), (3,'ab'), (4, NULL)")
    spark.sql("DELETE FROM tcat.ns.del_t WHERE v LIKE 'a%' OR k >= 4")
    // three-valued logic: the NULL-v row matched via k >= 4; 'b' survives
    assert(spark.sql("SELECT k FROM tcat.ns.del_t").as[Long]
      .collect().toSet === Set(2L))
    val e = intercept[Exception] {
      spark.sql("DELETE FROM tcat.ns.del_t WHERE length(v) = 1")
    }
    assert(e.getMessage.toLowerCase.contains("delete"))
    assert(spark.sql("SELECT count(*) FROM tcat.ns.del_t")
      .as[Long].head() === 1L)
  }

  test("TRUNCATE TABLE is the always-true delete; table stays SELECTable") {
    spark.sql("CREATE TABLE tcat.ns.tr_t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO tcat.ns.tr_t VALUES (1,'a'), (2,'b')")
    spark.sql("TRUNCATE TABLE tcat.ns.tr_t")
    assert(spark.sql("SELECT count(*) FROM tcat.ns.tr_t")
      .as[Long].head() === 0L)
    assert(spark.sql("SELECT * FROM tcat.ns.tr_t").columns.toSeq ===
      Seq("k", "v"))
  }

  test("VERSION AS OF reads its own snapshot and is read-only") {
    spark.sql("CREATE TABLE tcat.ns.tt_t (k BIGINT)")
    spark.sql("INSERT INTO tcat.ns.tt_t VALUES (1), (2)") // v2
    spark.sql("INSERT INTO tcat.ns.tt_t VALUES (3)")      // v3
    assert(spark.sql("SELECT count(*) FROM tcat.ns.tt_t VERSION AS OF 2")
      .as[Long].head() === 2L)
    assert(spark.sql("SELECT count(*) FROM tcat.ns.tt_t")
      .as[Long].head() === 3L)
    intercept[Exception] {
      spark.sql("DELETE FROM tcat.ns.tt_t VERSION AS OF 2 WHERE k = 1")
    }
    ()
  }

  test("ALTER TABLE ADD COLUMN is the metadata-only migration") {
    spark.sql("CREATE TABLE tcat.ns.ev_t (k BIGINT)")
    spark.sql("INSERT INTO tcat.ns.ev_t VALUES (1)")
    spark.sql("ALTER TABLE tcat.ns.ev_t ADD COLUMN note STRING")
    val rows = spark.sql("SELECT k, note FROM tcat.ns.ev_t")
      .as[(Long, Option[String])].collect().toSeq
    assert(rows === Seq((1L, None)))
    spark.sql("INSERT INTO tcat.ns.ev_t VALUES (2, 'x')")
    assert(spark.sql(
      "SELECT count(*) FROM tcat.ns.ev_t WHERE note IS NULL")
      .as[Long].head() === 1L)
  }

  test("stats skipping: a selective predicate schedules fewer files through SQL") {
    val p = s"$root/ns/sk_t"
    val df = (1 to 4000).map(i => (i.toLong, i % 97L)).toDF("k", "m")
      .repartitionByRange(8, col("k"))
    graft.engine.WriterLease.withLease(spark, p) {
      df.write.mode("overwrite").parquet(p)
      val files = Manifest.listDataFiles(spark, p)
      val stats = graft.engine.FileStats.collect(spark, p, files, Seq("k"))
      Manifest.commit(spark, p, files, stats)
    }
    val q = spark.sql("SELECT sum(m) FROM tcat.ns.sk_t WHERE k BETWEEN 10 AND 20")
    val expected = (10 to 20).map(_ % 97).sum.toLong
    assert(q.as[Long].head() === expected)
    val scanned = parquetFilesScanned(q).map(_.length)
    assert(scanned.nonEmpty && scanned.head < 8,
      s"expected the k-range scan to skip files, scanned $scanned of 8")
  }

  test("SQL UPDATE routes to the touched-files-only rewrite") {
    val _ = root
    spark.sql("CREATE TABLE tcat.ns.up_t (k BIGINT, v STRING, cents BIGINT)")
    spark.sql(
      "INSERT INTO tcat.ns.up_t VALUES (1,'a',10), (2,'b',20), (3,'a',30)")
    val v1 = Manifest.currentVersion(spark, s"$root/ns/up_t").get
    spark.sql(
      "UPDATE tcat.ns.up_t SET cents = cents + 100, v = upper(v) " +
        "WHERE v = 'a'")
    assert(spark.sql(
      "SELECT k, v, cents FROM tcat.ns.up_t ORDER BY k")
      .as[(Long, String, Long)].collect().toSeq ===
      Seq((1L, "A", 110L), (2L, "b", 20L), (3L, "A", 130L)))
    // one snapshot commit; time travel still sees the pre-update rows
    assert(Manifest.currentVersion(spark, s"$root/ns/up_t").get === v1 + 1)
    assert(spark.sql(
      s"SELECT cents FROM tcat.ns.up_t VERSION AS OF $v1 WHERE k = 1")
      .as[Long].head() === 10L)
    // uncorrelated subqueries are SUPPORTED since round 15 …
    spark.sql(
      "UPDATE tcat.ns.up_t SET cents = 0 WHERE k IN " +
        "(SELECT k FROM tcat.ns.up_t WHERE v = 'b')")
    assert(spark.sql(
      "SELECT cents FROM tcat.ns.up_t WHERE k = 2").as[Long].head() === 0L)
    // … correlated EXISTS with EQUALITY correlation decorrelates to a
    // semi-join since round 16 — rows whose k+1 exists in the table
    // (k = 1, 2 here) match; the outer side may be an expression
    spark.sql(
      "UPDATE tcat.ns.up_t SET cents = -1 WHERE EXISTS " +
        "(SELECT 1 FROM tcat.ns.up_t i WHERE i.k = tcat.ns.up_t.k + 1)")
    assert(spark.sql(
      "SELECT k, cents FROM tcat.ns.up_t ORDER BY k")
      .as[(Long, Long)].collect().toSeq ===
      Seq((1L, -1L), (2L, -1L), (3L, 130L)))
    // … NON-EQUALITY correlation stays loudly refused, not mis-run
    val e = intercept[Exception](spark.sql(
      "UPDATE tcat.ns.up_t SET cents = 0 WHERE EXISTS " +
        "(SELECT 1 FROM tcat.ns.up_t i WHERE i.k > tcat.ns.up_t.k)"))
    assert(e.getMessage.toLowerCase.contains("correlated"))
  }

  test("SQL MERGE INTO an unpartitioned table: SCD1 upsert semantics") {
    val _ = root
    spark.sql("CREATE TABLE tcat.ns.mg_t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO tcat.ns.mg_t VALUES (1,'old1'), (2,'old2')")
    Seq((2L, "new2"), (3L, "new3")).toDF("k", "v")
      .createOrReplaceTempView("mg_src")
    spark.sql("""MERGE INTO tcat.ns.mg_t t USING mg_src s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT k, v FROM tcat.ns.mg_t ORDER BY k")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "old1"), (2L, "new2"), (3L, "new3")))
    // WHEN MATCHED THEN DELETE is a supported shape since round 14
    // (generalized merge) — it removes exactly the matched keys
    spark.sql("""MERGE INTO tcat.ns.mg_t t USING mg_src s ON t.k = s.k
                 WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT k, v FROM tcat.ns.mg_t ORDER BY k")
      .as[(Long, String)].collect().toSeq === Seq((1L, "old1")))
    // a genuinely unsupported shape is still refused loudly (a
    // non-equality ON condition; NOT MATCHED BY SOURCE is supported
    // since round 15)
    val e = intercept[Exception](spark.sql(
      """MERGE INTO tcat.ns.mg_t t USING mg_src s ON t.k > s.k
         WHEN MATCHED THEN UPDATE SET *"""))
    assert(e.getMessage.contains("MERGE INTO"))
  }

  test("SQL MERGE INTO a date-partitioned table rewrites only touched " +
      "partitions") {
    val p = seedPartitioned("mgp_t")
    val v1 = Manifest.currentVersion(spark, p).get
    Seq((2, d1, 201L), (9, d1, 900L)).toDF("k", "d", "cents")
      .createOrReplaceTempView("mgp_src")
    spark.sql(
      """MERGE INTO tcat.ns.mgp_t t USING mgp_src s
         ON t.k = s.k AND t.d = s.d
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT k, cents FROM tcat.ns.mgp_t ORDER BY k")
      .as[(Int, Long)].collect().toSeq ===
      Seq((1, 100L), (2, 201L), (3, 300L), (4, 400L), (9, 900L)))
    // the untouched d2 partition's files survived bit-identical
    val pre = Manifest.filesAsOf(spark, p, v1)
      .filter(_.startsWith("d=2024-07-02/")).toSet
    assert(Manifest.currentLive(spark, p)
      .filter(_.startsWith("d=2024-07-02/")).toSet === pre)
    // partition column missing from the keys: refused loudly
    val e = intercept[Exception](spark.sql(
      """MERGE INTO tcat.ns.mgp_t t USING mgp_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *"""))
    assert(e.getMessage.contains("partitioned"))
  }

  test("CALL system.compact / system.vacuum run the maintenance verbs " +
      "with inspectable results") {
    val _ = root
    spark.sql("CREATE TABLE tcat.ns.pc_t (k BIGINT)")
    (1 to 5).foreach(i =>
      spark.sql(s"INSERT INTO tcat.ns.pc_t VALUES ($i)"))
    val p = s"$root/ns/pc_t"
    val nFilesBefore = Manifest.currentLive(spark, p).size
    assert(nFilesBefore === 5)
    val res = spark.sql(
      "CALL tcat.system.compact('ns.pc_t', target_file_mb => 1)")
      .as[(Long, Long)].head()
    assert(res._1 === 5L && res._2 < 5L)
    assert(spark.sql("SELECT sum(k) FROM tcat.ns.pc_t")
      .as[Long].head() === 15L)
    // vacuum retires pre-compaction versions and their files
    val deleted = spark.sql("CALL tcat.system.vacuum('ns.pc_t', keep => 1)")
      .as[Long].head()
    assert(deleted > 0L)
    assert(Manifest.versions(spark, p).size === 1)
    assert(spark.sql("SELECT sum(k) FROM tcat.ns.pc_t")
      .as[Long].head() === 15L)
    // unknown procedure: loud (Spark wraps our listing message in
    // FAILED_TO_LOAD_ROUTINE; the available-procedures hint rides the
    // cause)
    val e = intercept[Exception](
      spark.sql("CALL tcat.system.no_such_proc()"))
    assert(e.getMessage.contains("no_such_proc"))
  }

  test("CALL system.ann_reindex reports staleness, honors the " +
      "threshold, and swaps the generation pointer (round 17)") {
    val _ = root
    val base = java.nio.file.Files
      .createTempDirectory("graft-call-ann").toString
    val (src, idx) = (s"$base/src", s"$base/idx")
    val vs = (0 until 16).map { i =>
      val v = (0 until 4).map(j => ((i * 7 + j * 3) % 20 - 10).toLong)
      (i.toLong, v, v.map(x => x * x).sum)
    }.toDF("vec_id", "v", "n2")
      .withColumn("v", org.apache.spark.sql.functions.col("v")
        .cast("array<bigint>"))
    graft.engine.Upsert.append(spark, src,
      vs.filter($"vec_id" < 4), None)
    graft.engine.AnnIndex.buildIvfPq(spark, src, idx,
      graft.engine.AnnIndex.Spec(dim = 4, m = 2, pqK = 2, lloyd = 0))
    graft.engine.Upsert.append(spark, src,
      vs.filter($"vec_id" >= 4), None)
    graft.engine.AnnIndex.refresh(spark, src, idx)
    // 16 indexed / 4 built = staleness 4.0; a 10x threshold is a no-op
    val r0 = spark.sql(s"""CALL tcat.system.ann_reindex(
        source_path => '$src', index_root => '$idx',
        if_staler_than => 10.0D)""").collect().head
    assert(r0.getDouble(0) === 4.0 && !r0.getBoolean(1) &&
      r0.getString(3) === idx)
    // a crossed threshold rebuilds and swaps
    val r1 = spark.sql(s"""CALL tcat.system.ann_reindex(
        source_path => '$src', index_root => '$idx',
        if_staler_than => 2.0D)""").collect().head
    assert(r1.getDouble(0) === 4.0 && r1.getBoolean(1) &&
      r1.getLong(2) === 16L && r1.getString(3).contains("gen_v"))
    assert(graft.engine.AnnIndex.stats(spark, idx).staleness === 1.0)
  }

  test("persistent views (round 17): create/replace/drop, name-collision " +
      "refusal in BOTH directions, rename, survival across catalog " +
      "re-registration, CTE + column aliases, recursion guard") {
    val _ = root
    spark.sql("CREATE TABLE tcat.ns.vt (k BIGINT, pri STRING)")
    spark.sql(
      "INSERT INTO tcat.ns.vt VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    spark.sql("""CREATE VIEW tcat.ns.vv AS
                 SELECT pri, count(*) AS n FROM tcat.ns.vt GROUP BY pri""")
    assert(spark.sql("SELECT * FROM tcat.ns.vv ORDER BY pri")
      .as[(String, Long)].collect().toSeq === Seq(("a", 2L), ("b", 1L)))
    // the view tracks the CURRENT snapshot, like Postgres expansion
    spark.sql("INSERT INTO tcat.ns.vt VALUES (4, 'b')")
    assert(spark.sql("SELECT n FROM tcat.ns.vv WHERE pri = 'b'")
      .as[Long].head() === 2L)
    // name collisions refuse in BOTH directions — one relation namespace
    val e1 = intercept[Exception](
      spark.sql("CREATE TABLE tcat.ns.vv (x INT)"))
    assert(e1.getMessage.toLowerCase.contains("view"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("CREATE VIEW tcat.ns.vt AS SELECT 1 AS one"))
    assert(e2.getMessage.toLowerCase.contains("already exists"),
      e2.getMessage)
    // CREATE without REPLACE on an existing view refuses; IF NOT EXISTS
    // and OR REPLACE do their jobs
    intercept[Exception](
      spark.sql("CREATE VIEW tcat.ns.vv AS SELECT 1 AS one"))
    spark.sql("CREATE VIEW IF NOT EXISTS tcat.ns.vv AS SELECT 1 AS one")
    assert(spark.sql("SELECT * FROM tcat.ns.vv").columns.toSeq
      === Seq("pri", "n"), "IF NOT EXISTS must keep the old definition")
    spark.sql("""CREATE OR REPLACE VIEW tcat.ns.vv AS
                 SELECT count(*) AS total FROM tcat.ns.vt""")
    assert(spark.sql("SELECT total FROM tcat.ns.vv").as[Long].head()
      === 4L)
    // column aliases + a CTE in the body
    spark.sql("""CREATE VIEW tcat.ns.vv2 (a, b) AS
                 WITH c AS (SELECT k FROM tcat.ns.vt)
                 SELECT k, k * 2 FROM c""")
    assert(spark.sql("SELECT sum(a), sum(b) FROM tcat.ns.vv2")
      .as[(Long, Long)].head() === ((10L, 20L)))
    // SHOW VIEWS lists them
    assert(spark.sql("SHOW VIEWS IN tcat.ns").collect()
      .map(_.getString(1)).toSet === Set("vv", "vv2"))
    // persistence: a SECOND catalog over the same root serves the view
    spark.conf.set("spark.sql.catalog.tcat2", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tcat2.root", root)
    assert(spark.sql("SELECT total FROM tcat2.ns.vv").as[Long].head()
      === 4L)
    // rename via the catalog API; then a replace-created cycle refuses
    // loudly at read instead of hanging
    val g = new graft.catalog.GraftCatalog
    g.initialize("tcat", new org.apache.spark.sql.util
      .CaseInsensitiveStringMap(java.util.Map.of("root", root)))
    g.renameView(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "vv2"),
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "vv3"))
    assert(spark.sql("SELECT sum(a) FROM tcat.ns.vv3").as[Long].head()
      === 10L)
    spark.sql("""CREATE OR REPLACE VIEW tcat.ns.vv AS
                 SELECT * FROM tcat.ns.vv""")
    val e3 = intercept[Exception](spark.sql("SELECT * FROM tcat.ns.vv"))
    assert(e3.getMessage.contains("recursive"), e3.getMessage)
    // drop; a dropped view is gone and DROP VIEW IF EXISTS is silent
    spark.sql("DROP VIEW tcat.ns.vv")
    spark.sql("DROP VIEW IF EXISTS tcat.ns.vv")
    intercept[Exception](spark.sql("DROP VIEW tcat.ns.vv"))
    intercept[Exception](spark.sql("SELECT * FROM tcat.ns.vv"))
  }

  test("SQL materialized views (round 18): create materializes, the " +
      "rewrite answers definition-shaped queries from the mart, " +
      "staleness falls back, REFRESH re-arms, drop removes everything") {
    val _ = root
    seedPartitioned("mv_src")
    val defQuery =
      """SELECT d, count(*) AS n, sum(cents) AS total
         FROM tcat.ns.mv_src GROUP BY d"""
    spark.sql(
      s"CREATE MATERIALIZED VIEW tcat.ns.mv_agg AS $defQuery")
    // materialized NOW: the mart is an ordinary named table (its
    // partition column `d` reads back LAST, like any partitioned table)
    assert(spark.sql("SELECT d, n, total FROM tcat.ns.mv_agg ORDER BY d")
      .as[(Date, Long, Long)].collect().toSeq ===
      Seq((d1, 2L, 300L), (d2, 2L, 700L)))
    // a query RESTATING the definition over the SOURCE reads the mart
    def probe() = spark.sql(s"SELECT d, n, total FROM ($defQuery) " +
      "ORDER BY d")
    val planFresh = finalPlan(probe()).toString
    assert(planFresh.contains("mv_agg") && !planFresh.contains("mv_src"),
      s"fresh matview must answer the definition-shaped query:\n$planFresh")
    // staleness: a source commit stops the match — honest source scan,
    // fresh values
    spark.sql(s"INSERT INTO tcat.ns.mv_src VALUES (5, 50, DATE'2024-07-02')")
    val planStale = finalPlan(probe()).toString
    assert(planStale.contains("mv_src"),
      s"stale matview must fall back to the source:\n$planStale")
    assert(probe().as[(Date, Long, Long)].collect().toSeq ===
      Seq((d1, 2L, 300L), (d2, 3L, 750L)))
    // REFRESH recomputes only the changed partition and re-arms
    spark.sql("REFRESH MATERIALIZED VIEW tcat.ns.mv_agg")
    val planRefreshed = finalPlan(probe()).toString
    assert(planRefreshed.contains("mv_agg") &&
      !planRefreshed.contains("mv_src"), planRefreshed)
    assert(probe().as[(Date, Long, Long)].collect().toSeq ===
      Seq((d1, 2L, 300L), (d2, 3L, 750L)))
    // the definition doc persists: a second catalog over the same root
    // lists it (the fresh-session loader reads these docs)
    val g2 = new graft.catalog.GraftCatalog
    g2.initialize("tcatmv", new org.apache.spark.sql.util
      .CaseInsensitiveStringMap(java.util.Map.of("root", root)))
    assert(g2.listMatviews(Seq("ns")).map(_.name()).contains("mv_agg"))
    // collisions refuse: a table may not shadow the matview, a matview
    // may not shadow a table; IF NOT EXISTS is silent
    val e1 = intercept[Exception](
      spark.sql("CREATE TABLE tcat.ns.mv_agg (x INT)"))
    assert(e1.getMessage.toLowerCase.contains("exists"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"CREATE MATERIALIZED VIEW tcat.ns.mv_src AS $defQuery"))
    assert(e2.getMessage.toLowerCase.contains("table"), e2.getMessage)
    spark.sql(
      s"CREATE MATERIALIZED VIEW IF NOT EXISTS tcat.ns.mv_agg AS $defQuery")
    // multi-source definitions refuse loudly (single-source refresh)
    val e3 = intercept[Exception](spark.sql(
      """CREATE MATERIALIZED VIEW tcat.ns.mv_bad AS
         SELECT a.d, count(*) AS n FROM tcat.ns.mv_src a
         JOIN tcat.ns.lib_t b ON a.k = b.k GROUP BY a.d"""))
    assert(e3.getMessage.contains("single-source"), e3.getMessage)
    // drop removes the definition, the registration, and the mart
    spark.sql("DROP MATERIALIZED VIEW tcat.ns.mv_agg")
    intercept[Exception](spark.sql("SELECT * FROM tcat.ns.mv_agg"))
    spark.sql("DROP MATERIALIZED VIEW IF EXISTS tcat.ns.mv_agg")
    intercept[Exception](
      spark.sql("DROP MATERIALIZED VIEW tcat.ns.mv_agg"))
    val planDropped = finalPlan(probe()).toString
    assert(planDropped.contains("mv_src"), planDropped)
  }

  test("CALL system.maintain bundles DV absorb and ANN staleness check") {
    val _ = root
    val p = seedPartitioned("maint_t")
    spark.conf.set("spark.graft.dml.dv.maxRows", "4")
    try {
      Upsert.deleteWhereMor(spark, p, col("k") === 1)
      Upsert.deleteWhereMor(spark, p, col("k") === 2)
      Upsert.deleteWhereMor(spark, p, col("k") === 3)
      // 3/4 = 75% of the cap >= the default 20% fraction → absorb
      val r = spark.sql(
        "CALL tcat.system.maintain(table => 'ns.maint_t')").collect()
      assert(r.head.getBoolean(0) === true, "DV debt must trip absorb")
      val v = Manifest.currentVersion(spark, p).get
      assert(Manifest.dvsAsOf(spark, p, v).isEmpty)
      assert(spark.sql("SELECT count(*) FROM tcat.ns.maint_t")
        .as[Long].head() === 1L)
      // nothing left to do: second call is a clean no-op
      val r2 = spark.sql(
        "CALL tcat.system.maintain(table => 'ns.maint_t')").collect()
      assert(r2.head.getBoolean(0) === false)
    } finally spark.conf.unset("spark.graft.dml.dv.maxRows")
  }

  test("RENAME, DROP TABLE, and CASCADE namespace drop") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tcat.tmpns")
    spark.sql("CREATE TABLE tcat.tmpns.a (k BIGINT)")
    spark.sql("INSERT INTO tcat.tmpns.a VALUES (1)")
    spark.sql("ALTER TABLE tcat.tmpns.a RENAME TO tcat.tmpns.b")
    assert(spark.sql("SELECT count(*) FROM tcat.tmpns.b")
      .as[Long].head() === 1L)
    assert(spark.sql("SHOW TABLES IN tcat.tmpns").collect()
      .map(_.getString(1)).toSet === Set("b"))
    spark.sql("DROP TABLE tcat.tmpns.b")
    assert(spark.sql("SHOW TABLES IN tcat.tmpns").collect().isEmpty)
    spark.sql("CREATE TABLE tcat.tmpns.c (k BIGINT)")
    spark.sql("DROP NAMESPACE tcat.tmpns CASCADE")
    assert(!new java.io.File(s"$root/tmpns").exists())
  }
}
