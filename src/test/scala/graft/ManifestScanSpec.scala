package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Manifest, Upsert}

/** The zero-listing read path (round 16): snapshot reads must resolve
  * through the manifest-served file index — not Spark's listing-based
  * `InMemoryFileIndex` — whenever the `#flen` ledger covers the
  * snapshot and a schema is pinned; ledger-less (pre-round-16)
  * manifests must fall back to the legacy listing read and still
  * answer identically. The index-class assertions here are the
  * regression guard: a refactor that silently reverts to listing
  * would pass every value check while reintroducing the O(files)
  * metadata storm at scale.
  */
class ManifestScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-mscan").toString
    spark.conf.set("spark.sql.catalog.mscat", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mscat.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mscat.ns")
    r
  }

  private def indexClassesOf(df: org.apache.spark.sql.DataFrame)
      : Seq[String] = {
    val opt = df.queryExecution.optimizedPlan
    val v1 = opt.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => h.location.getClass.getName
        }
    }
    val v2 = opt.collect {
      case s: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => s.scan match {
        case p: org.apache.spark.sql.execution.datasources.v2.parquet
            .ParquetScan => p.fileIndex.getClass.getName
      }
    }
    v1 ++ v2
  }

  test("a catalog table's SQL scan resolves through the manifest-served " +
      "index — no listing-based InMemoryFileIndex in the plan") {
    root
    spark.sql("""CREATE TABLE mscat.ns.zl (k BIGINT, cents BIGINT,
                 pri STRING) PARTITIONED BY (pri)""")
    spark.sql("""INSERT INTO mscat.ns.zl VALUES
                 (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'a')""")
    val df = spark.sql(
      "SELECT pri, sum(cents) AS c FROM mscat.ns.zl GROUP BY pri")
    val idx = indexClassesOf(df)
    assert(idx.nonEmpty)
    assert(idx.forall(_.contains("ManifestFileIndex")),
      s"catalog scan must be manifest-served, got: $idx")
    assert(df.orderBy("pri").as[(String, Long)].collect().toSeq ===
      Seq(("a", 40L), ("b", 20L)))
  }

  test("a pinned library table's Manifest.read resolves through the " +
      "manifest-served index; values match the legacy read") {
    root
    // a catalog-created table read via the LIBRARY verb (pinned by
    // CREATE, ledger from the commit)
    spark.sql("CREATE TABLE mscat.ns.zl2 (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO mscat.ns.zl2 VALUES (1, 10), (2, 20)")
    val df = Manifest.read(spark, s"$root/ns/zl2")
    val idx = indexClassesOf(df)
    assert(idx.nonEmpty && idx.forall(_.contains("ManifestFileIndex")),
      s"library read must be manifest-served, got: $idx")
    assert(df.select("cents").as[Long].collect().sorted.toSeq ===
      Seq(10L, 20L))
  }

  test("a ledger-less (pre-round-16) manifest falls back to the legacy " +
      "listing read and answers identically; the next commit back-fills") {
    root
    spark.sql("CREATE TABLE mscat.ns.zl3 (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO mscat.ns.zl3 VALUES (1, 10), (2, 20)")
    val path = s"$root/ns/zl3"
    // strip the #flen header lines in place — the on-disk shape every
    // pre-round-16 manifest has
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mdir = new org.apache.hadoop.fs.Path(s"$path/_graft_manifest")
    fs.listStatus(mdir).filter(_.getPath.getName.endsWith(".list"))
      .foreach { st =>
        val in = fs.open(st.getPath)
        val lines = try new String(in.readAllBytes(), "UTF-8")
          finally in.close()
        val stripped = lines.split("\n").filterNot(_.startsWith("#flen "))
          .mkString("\n")
        val out = fs.create(st.getPath, true)
        try out.write(stripped.getBytes("UTF-8")) finally out.close()
      }
    // committed manifests are immutable in production, so readers memo
    // them — this simulation mutates one in place and must invalidate
    Manifest.invalidateListMemo(path)
    val v = Manifest.currentVersion(spark, path).get
    assert(Manifest.fileLengthsAsOf(spark, path, v).isEmpty,
      "fixture sanity: the ledger is gone")
    // with the auto-backfill disabled, the ledger-less snapshot takes
    // the legacy listing path and answers identically
    spark.conf.set("spark.graft.read.autoBackfillLens", "false")
    try {
      val df = Manifest.read(spark, path)
      assert(indexClassesOf(df).forall(c =>
        !c.contains("ManifestFileIndex")),
        "a ledger-less snapshot must take the legacy listing path")
      assert(df.select("cents").as[Long].collect().sorted.toSeq ===
        Seq(10L, 20L))
    } finally spark.conf.unset("spark.graft.read.autoBackfillLens")
    // round 17: with the default conf, the FIRST read pays the one
    // listing and commits the ledger back (a metadata-only version);
    // the read itself — and every later one — resolves zero-listing,
    // with no manual pinSchema
    val df1 = Manifest.read(spark, path)
    assert(indexClassesOf(df1).forall(_.contains("ManifestFileIndex")),
      "the auto-backfilled read must be manifest-served")
    assert(df1.select("cents").as[Long].collect().sorted.toSeq ===
      Seq(10L, 20L))
    val v1 = Manifest.currentVersion(spark, path).get
    assert(v1 === v + 1, "the backfill is one metadata-only commit")
    val lens1 = Manifest.fileLengthsAsOf(spark, path, v1)
    assert(Manifest.filesAsOf(spark, path, v1).forall(lens1.contains))
    assert(Manifest.filesAsOf(spark, path, v1).toSet ===
      Manifest.filesAsOf(spark, path, v).toSet,
      "the backfill must not change the file set")
    assert(indexClassesOf(Manifest.read(spark, path))
      .forall(_.contains("ManifestFileIndex")))
    // the next commit keeps a complete ledger
    spark.sql("INSERT INTO mscat.ns.zl3 VALUES (3, 30)")
    val v2 = Manifest.currentVersion(spark, path).get
    val lens = Manifest.fileLengthsAsOf(spark, path, v2)
    assert(Manifest.filesAsOf(spark, path, v2).forall(lens.contains))
    assert(Manifest.read(spark, path).select("cents").as[Long]
      .collect().sorted.toSeq === Seq(10L, 20L, 30L))
  }

  test("the SQL catalog route auto-backfills too: the first SELECT of a " +
      "ledger-less table commits the ledger and resolves zero-listing " +
      "(round 17)") {
    root
    spark.sql("CREATE TABLE mscat.ns.zl5 (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO mscat.ns.zl5 VALUES (1, 10), (2, 20)")
    val path = s"$root/ns/zl5"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mdir = new org.apache.hadoop.fs.Path(s"$path/_graft_manifest")
    fs.listStatus(mdir).filter(_.getPath.getName.endsWith(".list"))
      .foreach { st =>
        val in = fs.open(st.getPath)
        val lines = try new String(in.readAllBytes(), "UTF-8")
          finally in.close()
        val stripped = lines.split("\n").filterNot(_.startsWith("#flen "))
          .mkString("\n")
        val out = fs.create(st.getPath, true)
        try out.write(stripped.getBytes("UTF-8")) finally out.close()
      }
    Manifest.invalidateListMemo(path)
    val v = Manifest.currentVersion(spark, path).get
    assert(Manifest.fileLengthsAsOf(spark, path, v).isEmpty)
    val df = spark.sql("SELECT sum(cents) AS c FROM mscat.ns.zl5")
    assert(df.as[Long].head() === 30L)
    assert(Manifest.currentVersion(spark, path).get === v + 1)
    val idx = indexClassesOf(
      spark.sql("SELECT sum(cents) AS c FROM mscat.ns.zl5"))
    assert(idx.nonEmpty && idx.forall(_.contains("ManifestFileIndex")),
      s"post-backfill catalog scan must be manifest-served, got: $idx")
  }

  test("pinSchema upgrades an unpinned library table onto the " +
      "zero-listing path; values and partition types are unchanged") {
    val base = Files.createTempDirectory("graft-pin").toString
    val path = s"$base/t"
    Upsert.append(spark, path,
      Seq((1L, 10L, java.sql.Date.valueOf("2024-07-01")),
        (2L, 20L, java.sql.Date.valueOf("2024-07-02")))
        .toDF("k", "cents", "d"), Some("d"))
    val before = Manifest.read(spark, path)
    assert(indexClassesOf(before).forall(c =>
      !c.contains("ManifestFileIndex")),
      "an unpinned table reads via the legacy listing path")
    val beforeRows = before.orderBy("k").collect().map(_.toString).toSeq
    val beforeSchema = before.schema
    Manifest.pinSchema(spark, path)
    val after = Manifest.read(spark, path)
    assert(indexClassesOf(after).forall(_.contains("ManifestFileIndex")),
      "the pinned table must read via the manifest-served index")
    assert(after.schema === beforeSchema)
    assert(after.orderBy("k").collect().map(_.toString).toSeq ===
      beforeRows)
    // double-pin refuses; appends after the pin stay on the fast path
    intercept[IllegalArgumentException](Manifest.pinSchema(spark, path))
    Upsert.append(spark, path,
      Seq((3L, 30L, java.sql.Date.valueOf("2024-07-03")))
        .toDF("k", "cents", "d"), Some("d"))
    val grown = Manifest.read(spark, path)
    assert(indexClassesOf(grown).forall(_.contains("ManifestFileIndex")))
    assert(grown.count() === 3L)
  }

  test("_metadata.file_modification_time on a manifest-served read is " +
      "the snapshot's commit instant, not the 1970 epoch (round 17)") {
    root
    spark.sql("CREATE TABLE mscat.ns.zl6 (k BIGINT, cents BIGINT)")
    val before = System.currentTimeMillis()
    spark.sql("INSERT INTO mscat.ns.zl6 VALUES (1, 10)")
    val after = System.currentTimeMillis()
    // the hidden _metadata column is a V1 file-source feature — the
    // library read path (the DSv2 catalog table never exposed it)
    val lib = Manifest.read(spark, s"$root/ns/zl6")
    assert(indexClassesOf(lib).forall(_.contains("ManifestFileIndex")))
    val mt = Manifest.read(spark, s"$root/ns/zl6")
      .select(col("_metadata.file_modification_time").as("mt"))
      .as[java.sql.Timestamp].head().getTime
    assert(mt >= before - 1000 && mt <= after + 1000,
      s"commit-instant mtime expected in [$before, $after], got $mt")
  }

  test("a memoized manifest retired by ANOTHER process's vacuum fails " +
      "loudly at the recheck instead of serving a husk (round 17)") {
    root
    spark.sql("CREATE TABLE mscat.ns.zl7 (k BIGINT)")
    spark.sql("INSERT INTO mscat.ns.zl7 VALUES (1)")
    val path = s"$root/ns/zl7"
    val v = Manifest.currentVersion(spark, path).get
    // warm the memo
    assert(Manifest.filesAsOf(spark, path, v).nonEmpty)
    // simulate a cross-JVM vacuum: the .list key disappears but THIS
    // process's memo was never invalidated
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      f"$path/_graft_manifest/v$v%020d.list"), false)
    val prev = Manifest.MemoRecheckMillis
    Manifest.MemoRecheckMillis = 0L // force the existence recheck
    try {
      val e = intercept[Exception](
        Manifest.filesAsOf(spark, path, v))
      assert(e.getMessage.contains("retired"), e.getMessage)
    } finally Manifest.MemoRecheckMillis = prev
  }

  test("partition pruning on the manifest-served index schedules only " +
      "the matching leaves") {
    root
    spark.sql("""CREATE TABLE mscat.ns.zl4 (k BIGINT, cents BIGINT,
                 pri STRING) PARTITIONED BY (pri)""")
    spark.sql("""INSERT INTO mscat.ns.zl4 VALUES
                 (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'c')""")
    val df = spark.sql(
      "SELECT sum(cents) FROM mscat.ns.zl4 WHERE pri = 'b'")
    assert(df.as[Long].head() === 20L)
    // the V1 library read over the SAME manifest-served index prunes
    // to one file (the PlanSpec numFiles idiom — the served index's
    // listFiles honors partition filters exactly like the listing one)
    val read = Manifest.read(spark, s"$root/ns/zl4")
      .filter(col("pri") === "b")
    assert(indexClassesOf(read).forall(_.contains("ManifestFileIndex")))
    assert(read.collect().length === 1) // executes THIS QueryExecution
    val scan = read.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.metrics("numFiles").value === 1,
      s"expected 1 scanned file after pruning, got " +
        s"${scan.metrics("numFiles").value}")
  }
}
