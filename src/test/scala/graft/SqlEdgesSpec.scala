package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Manifest, Upsert}

/** Round-14 SQL-surface edges (verdict item 4): CTAS, INSERT OVERWRITE,
  * and the generalized MERGE (conditional UPDATE clauses, WHEN MATCHED
  * THEN DELETE, insert-only / matched-only shapes) — plus the library
  * verbs underneath them ([[Upsert.overwriteTable]],
  * [[Upsert.mergeActions]]).
  */
class SqlEdgesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-edges").toString
    spark.conf.set("spark.sql.catalog.ecat", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ecat.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ecat.ns")
    r
  }

  private val d1 = Date.valueOf("2024-07-01")
  private val d2 = Date.valueOf("2024-07-02")

  private def rowsOf(tbl: String): Map[Long, Long] =
    spark.sql(s"SELECT k, cents FROM $tbl").as[(Long, Long)]
      .collect().toMap

  test("CREATE TABLE AS SELECT lands the query result as v1+insert") {
    root
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "cents")
      .createOrReplaceTempView("__ctas_src")
    spark.sql("""CREATE TABLE ecat.ns.ctas AS
                 SELECT k, cents FROM __ctas_src WHERE k <> 2""")
    assert(rowsOf("ecat.ns.ctas") === Map(1L -> 10L, 3L -> 30L))
    // and it is a real manifest-managed table: versioned, SELECTable,
    // DML-able
    spark.sql("DELETE FROM ecat.ns.ctas WHERE k = 3")
    assert(rowsOf("ecat.ns.ctas") === Map(1L -> 10L))
  }

  test("CTAS into an existing table fails loudly; bucket-transform CTAS " +
      "lands the hidden layout (round 15)") {
    root
    Seq((1L, 1L)).toDF("k", "cents").createOrReplaceTempView("__ctas_src2")
    spark.sql("CREATE TABLE ecat.ns.ctas2 AS SELECT * FROM __ctas_src2")
    intercept[Exception](
      spark.sql("CREATE TABLE ecat.ns.ctas2 AS SELECT * FROM __ctas_src2"))
    // transform-partitioned CTAS is supported since round 15 — the
    // bucket becomes a hidden ptx_* directory the schema never shows
    spark.sql("""CREATE TABLE ecat.ns.ctas3 PARTITIONED BY (bucket(4, k))
                 AS SELECT * FROM __ctas_src2""")
    assert(spark.table("ecat.ns.ctas3").columns.toSeq === Seq("k", "cents"))
    assert(Manifest.currentLive(spark, s"$root/ns/ctas3")
      .forall(_.startsWith("ptx_bucket4_k=")))
    // an unsupported transform NAME still refuses loudly
    val e = intercept[Exception](
      spark.sql("""CREATE TABLE ecat.ns.ctas4 PARTITIONED BY
                   (truncate(4, k)) AS SELECT * FROM __ctas_src2"""))
    assert(e.getMessage.contains("unsupported partition transform") ||
      e.getMessage.contains("truncate"), e.getMessage)
  }

  test("PARTITIONED BY CREATE TABLE and CTAS: the declared column steers " +
      "the first insert's physical layout") {
    root
    spark.sql("""CREATE TABLE ecat.ns.pshell (k BIGINT, d DATE,
                 cents BIGINT) PARTITIONED BY (d)""")
    // Spark's v2 CREATE TABLE normalization moves partition columns to
    // the END of the schema — insert with an explicit column list
    spark.sql("""INSERT INTO ecat.ns.pshell (k, d, cents) VALUES
                 (1, DATE'2024-07-01', 10), (2, DATE'2024-07-02', 20)""")
    val p1 = s"$root/ns/pshell"
    assert(Manifest.livePartitions(spark, p1).sorted ===
      Seq("d=2024-07-01", "d=2024-07-02"))
    // and the layout survives INSERT OVERWRITE + a date-keyed SQL merge
    spark.sql("""INSERT OVERWRITE ecat.ns.pshell (k, d, cents) VALUES
                 (9, DATE'2024-07-03', 90)""")
    assert(Manifest.livePartitions(spark, p1) === Seq("d=2024-07-03"))
    // partitioned CTAS: layout derived from the declared column
    Seq((1L, Date.valueOf("2024-07-01"), 5L),
      (2L, Date.valueOf("2024-07-02"), 6L)).toDF("k", "d", "cents")
      .createOrReplaceTempView("__pctas_src")
    spark.sql("""CREATE TABLE ecat.ns.pctas PARTITIONED BY (d) AS
                 SELECT k, d, cents FROM __pctas_src""")
    assert(Manifest.livePartitions(spark, s"$root/ns/pctas").sorted ===
      Seq("d=2024-07-01", "d=2024-07-02"))
    assert(spark.sql("SELECT sum(cents) FROM ecat.ns.pctas")
      .as[Long].head() === 11L)
  }

  test("two-level PARTITIONED BY (d, country): inserts nest the layout, " +
      "SQL merge routes through the generalized rewrite, invalid " +
      "transforms refuse") {
    root
    spark.sql("""CREATE TABLE ecat.ns.p2 (k BIGINT, cents BIGINT,
                 d DATE, country STRING) PARTITIONED BY (d, country)""")
    spark.sql("""INSERT INTO ecat.ns.p2 (k, cents, d, country) VALUES
                 (1, 10, DATE'2024-07-01', 'US'),
                 (2, 20, DATE'2024-07-01', 'GB'),
                 (3, 30, DATE'2024-07-02', 'US')""")
    val p = s"$root/ns/p2"
    assert(Manifest.currentLive(spark, p).map(_.split("/").dropRight(1)
      .mkString("/")).sorted ===
      Seq("d=2024-07-01/country=GB", "d=2024-07-01/country=US",
        "d=2024-07-02/country=US"))
    // SQL merge on the deep layout: SCD1 via the generalized rewrite
    Seq((2L, 999L, d1, "GB"), (9L, 90L, d2, "GB"))
      .toDF("k", "cents", "d", "country")
      .createOrReplaceTempView("__p2_src")
    spark.sql("""MERGE INTO ecat.ns.p2 t USING __p2_src s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(rowsOf("ecat.ns.p2")
      === Map(1L -> 10L, 2L -> 999L, 3L -> 30L, 9L -> 90L))
    // the merge preserved the two-level layout (the insert landed in a
    // NEW leaf; untouched leaves survive under their original dirs)
    assert(Manifest.currentLive(spark, p)
      .exists(_.startsWith("d=2024-07-02/country=GB/")))
    // filtered read over both levels returns the one leaf's rows
    assert(spark.sql("""SELECT k FROM ecat.ns.p2
                        WHERE d = DATE'2024-07-01' AND country = 'GB'""")
      .as[Long].collect().toSeq === Seq(2L))
    // transforms compose with validation: hours() over a DATE column
    // has nothing to derive and refuses loudly
    val e = intercept[Exception](spark.sql(
      """CREATE TABLE ecat.ns.p3 (k BIGINT, d DATE)
         PARTITIONED BY (hours(d))"""))
    assert(e.getMessage.contains("no hours"), e.getMessage)
  }

  test("INSERT OVERWRITE PARTITION replaces exactly the named identity " +
      "partition; leaks and non-partition columns refuse") {
    root
    spark.sql("""CREATE TABLE ecat.ns.povw (k BIGINT, cents BIGINT,
                 d DATE) PARTITIONED BY (d)""")
    spark.sql("""INSERT INTO ecat.ns.povw (k, cents, d) VALUES
                 (1, 10, DATE'2024-07-01'), (2, 20, DATE'2024-07-01'),
                 (3, 30, DATE'2024-07-02')""")
    spark.sql("""INSERT OVERWRITE ecat.ns.povw
                 PARTITION (d = DATE'2024-07-01') (k, cents)
                 VALUES (9, 90)""")
    assert(spark.sql("SELECT k, cents FROM ecat.ns.povw ORDER BY k")
      .as[(Long, Long)].collect().toSeq === Seq((3L, 30L), (9L, 90L)))
    // the untouched partition kept its original files
    val p = s"$root/ns/povw"
    assert(Manifest.currentLive(spark, p)
      .exists(_.startsWith("d=2024-07-02/")))
    // a non-partition column in the static spec refuses loudly
    val e = intercept[Exception](spark.sql(
      """INSERT OVERWRITE ecat.ns.povw PARTITION (k = 1) (cents, d)
         VALUES (5, DATE'2024-07-03')"""))
    assert(e.getMessage.contains("PARTITION") ||
      e.getMessage.contains("partition"), e.getMessage)
  }

  test("static PARTITION overwrite handles Hive-escaped values " +
      "(':' in a string partition)") {
    root
    spark.sql("""CREATE TABLE ecat.ns.esc (k BIGINT, cents BIGINT,
                 tag STRING) PARTITIONED BY (tag)""")
    spark.sql("""INSERT INTO ecat.ns.esc (k, cents, tag) VALUES
                 (1, 10, 'a:b'), (2, 20, 'plain')""")
    // the on-disk dir is tag=a%3Ab; the declared value must be
    // escaped identically or the leak check spuriously fires
    spark.sql("""INSERT OVERWRITE ecat.ns.esc PARTITION (tag = 'a:b')
                 (k, cents) VALUES (9, 90)""")
    assert(spark.sql("SELECT k, cents FROM ecat.ns.esc ORDER BY k")
      .as[(Long, Long)].collect().toSeq === Seq((2L, 20L), (9L, 90L)))
  }

  test("static PARTITION overwrite on a TIMESTAMP identity layout " +
      "renders the literal exactly as the partition writer does") {
    root
    spark.sql("""CREATE TABLE ecat.ns.tovw (k BIGINT, cents BIGINT,
                 ts TIMESTAMP) PARTITIONED BY (ts)""")
    spark.sql("""INSERT INTO ecat.ns.tovw (k, cents, ts) VALUES
                 (1, 10, TIMESTAMP'2024-07-01 08:00:00'),
                 (2, 20, TIMESTAMP'2024-07-02 09:30:00')""")
    // java.sql.Timestamp.toString would render '...08:00:00.0' and
    // never match the staged 'ts=2024-07-01 08%3A00%3A00' dir
    spark.sql("""INSERT OVERWRITE ecat.ns.tovw
                 PARTITION (ts = TIMESTAMP'2024-07-01 08:00:00')
                 (k, cents) VALUES (9, 90)""")
    assert(spark.sql("SELECT k, cents FROM ecat.ns.tovw ORDER BY k")
      .as[(Long, Long)].collect().toSeq === Seq((2L, 20L), (9L, 90L)))
  }

  test("dynamic partitionOverwriteMode through SQL matches the library " +
      "verb (round 16 lifted the r15 refusal)") {
    root
    spark.sql("""CREATE TABLE ecat.ns.dovw (k BIGINT, cents BIGINT,
                 d DATE) PARTITIONED BY (d)""")
    spark.sql("""INSERT INTO ecat.ns.dovw (k, cents, d) VALUES
                 (1, 10, DATE'2024-07-01'), (3, 30, DATE'2024-07-02')""")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      spark.sql("""INSERT OVERWRITE ecat.ns.dovw (k, cents, d) VALUES
                   (9, 90, DATE'2024-07-01')""")
    } finally spark.conf.set(
      "spark.sql.sources.partitionOverwriteMode", prev)
    assert(spark.sql("SELECT k, cents FROM ecat.ns.dovw ORDER BY k")
      .as[(Long, Long)].collect().toSeq === Seq((3L, 30L), (9L, 90L)))
    // the library verb lands the identical semantics on the same table
    Upsert.overwritePartitions(spark, s"$root/ns/dovw",
      Seq((8L, 80L, Date.valueOf("2024-07-01")))
        .toDF("k", "cents", "d"), "d")
    assert(spark.sql("SELECT k, cents FROM ecat.ns.dovw ORDER BY k")
      .as[(Long, Long)].collect().toSeq === Seq((3L, 30L), (8L, 80L)))
  }

  test("TIMESTAMP AS OF resolves to the latest commit at or before the " +
      "instant; earlier instants refuse") {
    root
    spark.sql("CREATE TABLE ecat.ns.tt (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.tt VALUES (1, 10)")
    val between = java.time.Instant.now()
    Thread.sleep(1100) // manifest mtimes are second-granular on some fs
    spark.sql("INSERT INTO ecat.ns.tt VALUES (2, 20)")
    val atBetween = spark.sql(
      s"SELECT sum(cents) FROM ecat.ns.tt TIMESTAMP AS OF '$between'")
      .as[Long].head()
    assert(atBetween === 10L)
    val now = spark.sql(
      s"SELECT sum(cents) FROM ecat.ns.tt TIMESTAMP AS OF " +
        s"'${java.time.Instant.now()}'").as[Long].head()
    assert(now === 30L)
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM ecat.ns.tt TIMESTAMP AS OF '2000-01-01'").collect())
    assert(e.getMessage.contains("no version committed"), e.getMessage)
  }

  test("INSERT OVERWRITE replaces the whole table in one snapshot commit") {
    root
    spark.sql("CREATE TABLE ecat.ns.ovw (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.ovw VALUES (1, 10), (2, 20)")
    val path = s"$root/ns/ovw"
    val vBefore = Manifest.currentVersion(spark, path).get
    spark.sql("INSERT OVERWRITE ecat.ns.ovw VALUES (7, 70), (8, 80)")
    assert(rowsOf("ecat.ns.ovw") === Map(7L -> 70L, 8L -> 80L))
    // exactly one version advanced, and time travel still sees the old
    assert(Manifest.currentVersion(spark, path).get === vBefore + 1)
    assert(Manifest.readAsOf(spark, path, vBefore)
      .select("k").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("overwriteTable on a partitioned table keeps the layout") {
    val p = Files.createTempDirectory("graft-ovw").resolve("t").toString
    Upsert.append(spark, p,
      Seq((1, d1, 10L), (2, d2, 20L)).toDF("k", "d", "cents"), Some("d"))
    Upsert.overwriteTable(spark, p,
      Seq((9, d1, 90L)).toDF("k", "d", "cents"), Some("d"))
    assert(Manifest.read(spark, p).select("k").as[Int].collect().toSet
      === Set(9))
    assert(Manifest.livePartitions(spark, p) === Seq("d=2024-07-01"))
  }

  test("MERGE WHEN MATCHED THEN DELETE removes matches, keeps the rest") {
    root
    spark.sql("CREATE TABLE ecat.ns.mdel (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.mdel VALUES (1, 10), (2, 20), (3, 30)")
    Seq(1L, 3L, 99L).toDF("k").createOrReplaceTempView("__del_src")
    spark.sql("""MERGE INTO ecat.ns.mdel t USING __del_src s
                 ON t.k = s.k
                 WHEN MATCHED THEN DELETE""")
    assert(rowsOf("ecat.ns.mdel") === Map(2L -> 20L))
  }

  test("MERGE with conditional UPDATE, conditional DELETE and conditional " +
      "INSERT resolves clauses first-match-wins") {
    root
    spark.sql("CREATE TABLE ecat.ns.mcond (k BIGINT, cents BIGINT)")
    spark.sql(
      "INSERT INTO ecat.ns.mcond VALUES (1, 10), (2, 20), (3, 30), (4, 40)")
    Seq((1L, 111L), (2L, 5L), (3L, 333L), (8L, 800L), (9L, 9L))
      .toDF("k", "cents").createOrReplaceTempView("__cond_src")
    spark.sql("""MERGE INTO ecat.ns.mcond t USING __cond_src s
                 ON t.k = s.k
                 WHEN MATCHED AND s.cents < t.cents THEN DELETE
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED AND s.cents > 100 THEN INSERT *""")
    // k=1: source 111 >= 10 → update to 111; k=2: 5 < 20 → delete;
    // k=3: update to 333; k=4: untouched; k=8: insert (800 > 100);
    // k=9: not inserted (9 <= 100)
    assert(rowsOf("ecat.ns.mcond")
      === Map(1L -> 111L, 3L -> 333L, 4L -> 40L, 8L -> 800L))
  }

  test("matched-only merge needs no full-row source; delete-only source " +
      "can be keys-only") {
    root
    spark.sql("CREATE TABLE ecat.ns.mkey (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.mkey VALUES (1, 10), (2, 20)")
    // source has ONLY the key column — fine for a delete-only merge
    Seq(2L).toDF("k").createOrReplaceTempView("__key_src")
    spark.sql("""MERGE INTO ecat.ns.mkey t USING __key_src s ON t.k = s.k
                 WHEN MATCHED THEN DELETE""")
    assert(rowsOf("ecat.ns.mkey") === Map(1L -> 10L))
  }

  test("generalized merge on a date-partitioned table rewrites only " +
      "touched files and keeps partition layout") {
    val p = Files.createTempDirectory("graft-mact").resolve("t").toString
    Upsert.upsertPartitioned(spark, p,
      Seq((1, d1, 10L), (2, d1, 20L), (3, d2, 30L))
        .toDF("k", "d", "cents"), Seq("k", "d"), "d")
    val before = Manifest.currentLive(spark, p).toSet
    val (affected, inserted) = Upsert.mergeActions(spark, p,
      Seq((2, d1, 999L)).toDF("k", "d", "cents"), Seq("k"),
      Seq(Upsert.MatchedUpdate(None)), None, Seq("d"))
    assert(affected === 1L && inserted === 0L)
    val t = Manifest.read(spark, p)
    assert(t.filter(col("k") === 2).select("cents").as[Long].head() === 999L)
    assert(t.count() === 3)
    // d2's file was untouched: still live under its original name
    val after = Manifest.currentLive(spark, p).toSet
    val d2Files = before.filter(_.startsWith("d=2024-07-02/"))
    assert(d2Files.subsetOf(after), "untouched partition files must survive")
  }

  test("insert-only merge (WHEN NOT MATCHED alone) appends just the new keys") {
    val p = Files.createTempDirectory("graft-mins").resolve("t").toString
    Upsert.append(spark, p, Seq((1L, 10L), (2L, 20L)).toDF("k", "cents"),
      None)
    val (affected, inserted) = Upsert.mergeActions(spark, p,
      Seq((2L, 999L), (5L, 50L)).toDF("k", "cents"), Seq("k"),
      Seq.empty, Some(None), Seq.empty)
    assert(affected === 0L && inserted === 1L)
    assert(Manifest.read(spark, p).as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 2L -> 20L, 5L -> 50L))
  }

  test("change-feed stream resolves by catalog table name") {
    root
    spark.sql("CREATE TABLE ecat.ns.cfs (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.cfs VALUES (1, 10)")
    val base = Files.createTempDirectory("graft-cfs").toString
    graft.streaming.GraftStreaming.changeFeedStreamByName(spark,
      "ecat.ns.cfs", Seq("k"), "byname", s"$base/ckpt")(b =>
      b.write.mode("append").parquet(s"$base/out"))
      .awaitTermination()
    val rows = spark.read.parquet(s"$base/out")
      .select("k", "cents", graft.engine.ChangeFeed.ChangeCol)
      .as[(Long, Long, String)].collect().toSeq
    assert(rows === Seq((1L, 10L, "insert")))
    val e = intercept[IllegalArgumentException](
      graft.streaming.GraftStreaming.changeFeedStreamByName(spark,
        "nocat.ns.t", Seq("k"), "x", s"$base/ckpt2")(_ => ()))
    assert(e.getMessage.contains("nocat"))
  }

  test("CALL system.history lists the commit trail; vacuum retain_hours " +
      "is the SQL knob for the retention floor") {
    root
    spark.sql("CREATE TABLE ecat.ns.hist (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.hist VALUES (1, 10)")
    spark.sql("INSERT INTO ecat.ns.hist VALUES (2, 20)")
    spark.sql("DELETE FROM ecat.ns.hist WHERE k = 1")
    val h = spark.sql("CALL ecat.system.history('ns.hist')")
      .select("version", "n_files", "added", "retired")
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(h.map(_._1) === Seq(1L, 2L, 3L, 4L))
    assert(h.head === ((1L, 0, 0, 0))) // the shell
    assert(h(1)._3 === 1 && h(2)._3 === 1) // two inserts
    assert(h(3)._4 === 1) // the delete retired the k=1 file
    // retention floor through SQL: everything is seconds old, so a
    // keep=1 vacuum with retain_hours=1 retires nothing
    assert(spark.sql(
      "CALL ecat.system.vacuum('ns.hist', keep => 1, retain_hours => 1)")
      .as[Long].head() === 0L)
    assert(spark.sql("CALL ecat.system.history('ns.hist')").count() === 4)
    // without the floor, history truncates to the kept version
    spark.sql("CALL ecat.system.vacuum('ns.hist', keep => 1)")
    assert(spark.sql("CALL ecat.system.history('ns.hist')")
      .select("version").as[Long].collect().toSeq === Seq(4L))
  }

  test("merge refusal paths stay loud: WITH SCHEMA EVOLUTION, key " +
      "reassignment, duplicate source keys") {
    root
    spark.sql("CREATE TABLE ecat.ns.mref (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.mref VALUES (1, 10)")
    Seq((1L, 100L)).toDF("k", "cents").createOrReplaceTempView("__ref_src")
    // NOT MATCHED BY SOURCE is supported since round 15; the evolving
    // variant stays refused
    val e1 = intercept[Exception](spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO ecat.ns.mref t
         USING __ref_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *"""))
    assert(e1.getMessage.contains("SCHEMA EVOLUTION"))
    // column-level SET is supported since round 15 — but assigning a
    // MERGE KEY would rekey matched rows and stays refused
    val e2 = intercept[Exception](spark.sql(
      """MERGE INTO ecat.ns.mref t USING __ref_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET k = s.k + 1"""))
    assert(e2.getMessage.contains("merge key"))
    Seq((1L, 1L), (1L, 2L)).toDF("k", "cents")
      .createOrReplaceTempView("__dup_src")
    val e3 = intercept[Exception](spark.sql(
      """MERGE INTO ecat.ns.mref t USING __dup_src s ON t.k = s.k
         WHEN MATCHED THEN DELETE"""))
    assert(e3.getMessage.contains("more than once"))
  }

  // ---- round 15: column-level SET assignments -----------------------

  test("column-level SET: conditional clauses with both-side " +
      "expressions apply first-match-wins") {
    root
    spark.sql("CREATE TABLE ecat.ns.ma1 (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.ma1 VALUES (1, 10), (2, 20), (3, 30)")
    Seq((1L, 100L), (3L, 300L), (7L, 700L)).toDF("k", "cents")
      .createOrReplaceTempView("__ma1_src")
    spark.sql(
      """MERGE INTO ecat.ns.ma1 t USING __ma1_src s ON t.k = s.k
         WHEN MATCHED AND t.k = 1 THEN UPDATE SET cents = t.cents + s.cents
         WHEN MATCHED THEN UPDATE SET cents = s.cents - t.cents
         WHEN NOT MATCHED THEN INSERT *""")
    assert(rowsOf("ecat.ns.ma1")
      === Map(1L -> 110L, 2L -> 20L, 3L -> 270L, 7L -> 700L))
  }

  test("column-level SET mixes with DELETE in clause order; values are " +
      "assignment-CAST to the target type") {
    root
    spark.sql("CREATE TABLE ecat.ns.ma2 (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.ma2 VALUES (1, 10), (2, 20), (3, 30)")
    Seq((1L, 100L), (3L, 300L)).toDF("k", "cents")
      .createOrReplaceTempView("__ma2_src")
    spark.sql(
      """MERGE INTO ecat.ns.ma2 t USING __ma2_src s ON t.k = s.k
         WHEN MATCHED AND s.cents > 250 THEN DELETE
         WHEN MATCHED THEN UPDATE SET cents = t.cents * 1.5""")
    // k=3 deleted by the first clause; k=1 updated 10*1.5 = 15.0, cast
    // back to the BIGINT column (SQL assignment-cast); k=2 untouched
    assert(rowsOf("ecat.ns.ma2") === Map(1L -> 15L, 2L -> 20L))
  }

  test("library mergeActions refuses duplicate assignments and " +
      "assignments to columns outside the table") {
    val p = Files.createTempDirectory("graft-maref").resolve("t").toString
    Upsert.append(spark, p, Seq((1L, 10L)).toDF("k", "cents"), None)
    val src = Seq((1L, 100L)).toDF("k", "cents")
    val dup = intercept[IllegalArgumentException](
      Upsert.mergeActions(spark, p, src, Seq("k"),
        Seq(Upsert.MatchedUpdate(None,
          Seq("cents" -> col("cents"), "cents" -> (col("cents") + 1)))),
        None, Seq.empty))
    assert(dup.getMessage.contains("duplicate assignment"))
    val unknown = intercept[IllegalArgumentException](
      Upsert.mergeActions(spark, p, src, Seq("k"),
        Seq(Upsert.MatchedUpdate(None, Seq("nope" -> col("cents")))),
        None, Seq.empty))
    assert(unknown.getMessage.contains("nope"))
  }

  // ---- round 15: generalized merge against an empty shell (ADVICE) --

  test("generalized MERGE into a fresh CREATE TABLE shell: matched " +
      "clauses no-op, conditional insert lands") {
    root
    spark.sql("CREATE TABLE ecat.ns.shell1 (k BIGINT, cents BIGINT)")
    Seq((1L, 100L), (2L, 20L), (3L, 300L)).toDF("k", "cents")
      .createOrReplaceTempView("__shell_src")
    spark.sql(
      """MERGE INTO ecat.ns.shell1 t USING __shell_src s ON t.k = s.k
         WHEN MATCHED THEN DELETE
         WHEN NOT MATCHED AND s.cents >= 100 THEN INSERT *""")
    assert(rowsOf("ecat.ns.shell1") === Map(1L -> 100L, 3L -> 300L))
  }

  test("shell merges validate clauses exactly like non-empty merges: " +
      "a typo'd SET column refuses instead of silently no-opping") {
    root
    spark.sql("CREATE TABLE ecat.ns.shellv (k BIGINT, cents BIGINT)")
    val src = Seq((1L, 100L)).toDF("k", "cents")
    val tblPath = s"$root/ns/shellv"
    val e = intercept[IllegalArgumentException](
      Upsert.mergeActions(spark, tblPath, src, Seq("k"),
        Seq(Upsert.MatchedUpdate(None, Seq("typo_col" -> col("cents")))),
        None, Seq.empty))
    assert(e.getMessage.contains("typo_col"))
    // and a SET * clause still demands a full-row source on a shell
    val e2 = intercept[IllegalArgumentException](
      Upsert.mergeActions(spark, tblPath,
        Seq(Tuple1(1L)).toDF("k"), Seq("k"),
        Seq(Upsert.MatchedUpdate(None)), None, Seq.empty))
    assert(e2.getMessage.contains("full-row"))
  }

  test("matched-only generalized merge on a shell is a (0,0) no-op; " +
      "a fully-deleted table takes the shell path too") {
    root
    spark.sql("CREATE TABLE ecat.ns.shell2 (k BIGINT, cents BIGINT)")
    val tblPath = spark.sql("DESCRIBE TABLE EXTENDED ecat.ns.shell2")
      .filter(col("col_name") === "Location")
      .select("data_type").as[String].head()
    val src = Seq((1L, 100L)).toDF("k", "cents")
    val (a, i) = Upsert.mergeActions(spark, tblPath, src, Seq("k"),
      Seq(Upsert.MatchedUpdate(None)), None, Seq.empty)
    assert(a === 0L && i === 0L)
    assert(spark.sql("SELECT * FROM ecat.ns.shell2").count() === 0L)
    // land a row, delete it, then merge-insert into the EMPTY (but
    // version-advanced) table — the shell path must apply again
    spark.sql("INSERT INTO ecat.ns.shell2 VALUES (9, 90)")
    spark.sql("DELETE FROM ecat.ns.shell2 WHERE k = 9")
    spark.sql(
      """MERGE INTO ecat.ns.shell2 t USING __shell_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED AND s.cents < 250 THEN INSERT *""")
    assert(rowsOf("ecat.ns.shell2") === Map(1L -> 100L, 2L -> 20L))
  }

  // ---- round 15: uncorrelated subqueries in DML predicates ----------

  test("DELETE WHERE IN/NOT IN (SELECT …) and uncorrelated EXISTS " +
      "literalize and rewrite only touched files") {
    root
    spark.sql("CREATE TABLE ecat.ns.din (k BIGINT, cents BIGINT)")
    spark.sql(
      "INSERT INTO ecat.ns.din VALUES (1,10),(2,20),(3,30),(4,40)")
    Seq(2L, 3L).toDF("k").createOrReplaceTempView("__din_keys")
    spark.sql("""DELETE FROM ecat.ns.din
                 WHERE k IN (SELECT k FROM __din_keys WHERE k > 2)""")
    assert(rowsOf("ecat.ns.din") === Map(1L -> 10L, 2L -> 20L, 4L -> 40L))
    spark.sql("""DELETE FROM ecat.ns.din
                 WHERE k NOT IN (SELECT k FROM __din_keys)""")
    assert(rowsOf("ecat.ns.din") === Map(2L -> 20L))
    // uncorrelated EXISTS over an empty set deletes nothing
    spark.sql("""DELETE FROM ecat.ns.din
                 WHERE EXISTS (SELECT 1 FROM __din_keys WHERE k > 99)""")
    assert(rowsOf("ecat.ns.din") === Map(2L -> 20L))
    // IN over an EMPTY subquery result is FALSE for every row
    spark.sql("""DELETE FROM ecat.ns.din
                 WHERE k IN (SELECT k FROM __din_keys WHERE k > 99)""")
    assert(rowsOf("ecat.ns.din") === Map(2L -> 20L))
  }

  test("scalar subqueries in UPDATE values and MERGE clause conditions; " +
      "correlated and oversized ones refuse loudly") {
    root
    spark.sql("CREATE TABLE ecat.ns.dsq (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.dsq VALUES (1,10),(2,20)")
    Seq(5L, 7L).toDF("v").createOrReplaceTempView("__dsq_v")
    spark.sql("""UPDATE ecat.ns.dsq
                 SET cents = cents + (SELECT min(v) FROM __dsq_v)
                 WHERE k = 1""")
    assert(rowsOf("ecat.ns.dsq") === Map(1L -> 15L, 2L -> 20L))
    // MERGE clause condition with an uncorrelated scalar subquery
    Seq((1L, 100L), (2L, 200L)).toDF("k", "cents")
      .createOrReplaceTempView("__dsq_src")
    spark.sql(
      """MERGE INTO ecat.ns.dsq t USING __dsq_src s ON t.k = s.k
         WHEN MATCHED AND t.cents > (SELECT min(v) FROM __dsq_v) * 3
           THEN UPDATE SET *""")
    assert(rowsOf("ecat.ns.dsq") === Map(1L -> 15L, 2L -> 200L))
    // a >1-row scalar subquery is a loud error
    val multi = intercept[Exception](spark.sql(
      """UPDATE ecat.ns.dsq SET cents = (SELECT v FROM __dsq_v)
         WHERE k = 1"""))
    assert(multi.getMessage.contains("returned 2 rows")
      || multi.getMessage.toLowerCase.contains("more than one row"))
    // past maxRows a DELETE predicate routes through the distributed
    // membership join (round 17) instead of refusing …
    spark.conf.set("spark.graft.dml.subquery.maxRows", "1")
    try {
      spark.sql(
        "DELETE FROM ecat.ns.dsq WHERE k IN (SELECT v FROM __dsq_v)")
      assert(rowsOf("ecat.ns.dsq") === Map(1L -> 15L, 2L -> 200L))
      // the IN value may be an expression: k+4 ∈ {5,7} hits k=1
      spark.sql(
        "DELETE FROM ecat.ns.dsq WHERE k + 4 IN (SELECT v FROM __dsq_v)")
      assert(rowsOf("ecat.ns.dsq") === Map(2L -> 200L))
      // … but positions that must literalize — a SET value evaluates
      // inside the rewrite projection, out of any join's reach — still
      // refuse loudly at the cap
      val cap = intercept[Exception](spark.sql(
        """UPDATE ecat.ns.dsq
           SET cents = CASE WHEN cents IN (SELECT v FROM __dsq_v)
                            THEN 0 ELSE cents END
           WHERE k = 2"""))
      assert(cap.getMessage.contains("maxRows"), cap.getMessage)
    } finally spark.conf.unset("spark.graft.dml.subquery.maxRows")
  }

  // ---- round 15: ALTER TABLE RENAME / DROP COLUMN through SQL -------

  test("ALTER TABLE RENAME COLUMN: SQL reads coalesce old files under " +
      "the new name; SELECT * shows only logical columns") {
    root
    spark.sql("CREATE TABLE ecat.ns.rn1 (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.rn1 VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE ecat.ns.rn1 RENAME COLUMN cents TO price")
    spark.sql("INSERT INTO ecat.ns.rn1 VALUES (3, 30)")
    assert(spark.sql("SELECT * FROM ecat.ns.rn1").columns.toSeq
      === Seq("k", "price"))
    assert(spark.sql("SELECT k, price FROM ecat.ns.rn1")
      .as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // filter on the renamed column spans both file generations
    assert(spark.sql(
      "SELECT count(*) FROM ecat.ns.rn1 WHERE price >= 20")
      .as[Long].head() === 2L)
    // aggregate + join through the rename
    assert(spark.sql(
      "SELECT CAST(sum(price) AS BIGINT) FROM ecat.ns.rn1")
      .as[Long].head() === 60L)
    // time travel to a pre-rename version keeps the old shape
    assert(spark.sql("SELECT * FROM ecat.ns.rn1 VERSION AS OF 2")
      .columns.toSeq === Seq("k", "cents"))
  }

  test("DML and MERGE keep working after a rename; DROP COLUMN " +
      "narrows SQL reads") {
    root
    spark.sql(
      "CREATE TABLE ecat.ns.rn2 (k BIGINT, cents BIGINT, flag BIGINT)")
    spark.sql(
      "INSERT INTO ecat.ns.rn2 VALUES (1, 10, 0), (2, 20, 1)")
    spark.sql("ALTER TABLE ecat.ns.rn2 RENAME COLUMN cents TO price")
    spark.sql("UPDATE ecat.ns.rn2 SET price = price + 1 WHERE k = 1")
    Seq((2L, 200L, 9L), (5L, 50L, 9L)).toDF("k", "price", "flag")
      .createOrReplaceTempView("__rn2_src")
    spark.sql(
      """MERGE INTO ecat.ns.rn2 t USING __rn2_src s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET price = s.price - t.price
         WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT k, price FROM ecat.ns.rn2")
      .as[(Long, Long)].collect().toMap
      === Map(1L -> 11L, 2L -> 180L, 5L -> 50L))
    spark.sql("ALTER TABLE ecat.ns.rn2 DROP COLUMN flag")
    assert(spark.sql("SELECT * FROM ecat.ns.rn2").columns.toSeq
      === Seq("k", "price"))
    // re-adding the dropped name refuses (stale values in live files)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE ecat.ns.rn2 ADD COLUMN flag BIGINT"))
    assert(e.getMessage.contains("stale values"))
    // subquery over the renamed table (rename expansion must apply
    // inside subquery plans too)
    spark.sql("CREATE TABLE ecat.ns.rn3 (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.rn3 VALUES (5, 1), (9, 9)")
    assert(spark.sql(
      """SELECT count(*) FROM ecat.ns.rn3
         WHERE k IN (SELECT k FROM ecat.ns.rn2 WHERE price > 40)""")
      .as[Long].head() === 1L)
  }

  // ---- round 15: reserved internal names refuse loudly (ADVICE) -----

  test("target columns named like merge-rewrite internals are refused, " +
      "not silently corrupted") {
    Seq("__action", "__graft_file", "__mk_k", "__ex_k", "__src_x")
      .foreach { bad =>
        val p = Files.createTempDirectory("graft-rsv").resolve("t").toString
        Upsert.append(spark, p,
          Seq((1L, 10L)).toDF("k", bad), None)
        val e = intercept[IllegalArgumentException](
          Upsert.mergeActions(spark, p,
            Seq((1L, 99L)).toDF("k", bad), Seq("k"),
            Seq(Upsert.MatchedUpdate(None)), Some(None), Seq.empty))
        assert(e.getMessage.contains("reserved"), s"for $bad: $e")
      }
  }

  // ---- round 15: WHEN NOT MATCHED BY SOURCE + column-level INSERT ----

  test("WHEN NOT MATCHED BY SOURCE updates/deletes target-only rows; " +
      "matched and insert clauses compose in one statement") {
    root
    spark.sql("CREATE TABLE ecat.ns.fullm (k BIGINT, cents BIGINT)")
    spark.sql(
      "INSERT INTO ecat.ns.fullm VALUES (1, 10), (2, 20), (3, 30), (4, 40)")
    Seq((1L, 100L), (9L, 900L)).toDF("k", "cents")
      .createOrReplaceTempView("__bs_src")
    spark.sql("""MERGE INTO ecat.ns.fullm t USING __bs_src s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET cents = t.cents + s.cents
                 WHEN NOT MATCHED THEN INSERT (k, cents) VALUES (s.k, s.cents)
                 WHEN NOT MATCHED BY SOURCE AND t.k = 2 THEN DELETE
                 WHEN NOT MATCHED BY SOURCE AND t.cents >= 40
                   THEN UPDATE SET cents = t.cents * -1""")
    // k=1 matched (10+100); k=2 target-only, deleted; k=3 target-only,
    // no by-source clause fires (cents < 40), survives; k=4 target-only,
    // negated; k=9 inserted
    assert(rowsOf("ecat.ns.fullm")
      === Map(1L -> 110L, 3L -> 30L, 4L -> -40L, 9L -> 900L))
  }

  test("by-source-only merge ignores source non-key columns and runs " +
      "clauses first-match-wins") {
    val p = Files.createTempDirectory("graft-bso").resolve("t").toString
    Upsert.append(spark, p,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "cents"), None)
    // a keys-only source is fine: by-source clauses never read it
    val (affected, inserted) = Upsert.mergeProgram(spark, p,
      Seq(1L).toDF("k"), Seq("k"), Seq.empty,
      Seq(Upsert.BySourceUpdate(Some(col("cents") < 25),
          Seq("cents" -> (col("cents") + 1000))),
        Upsert.BySourceDelete(None)),
      None, Seq.empty)
    // k=1 matched by source → untouched; k=2 first clause (20<25);
    // k=3 falls through to the unconditional DELETE
    assert(affected === 2L && inserted === 0L)
    assert(Manifest.read(spark, p).as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 2L -> 1020L))
  }

  test("column-level INSERT fills unassigned columns with NULL and " +
      "assignment-casts values") {
    root
    spark.sql(
      "CREATE TABLE ecat.ns.insc (k BIGINT, cents BIGINT, tag STRING)")
    spark.sql("INSERT INTO ecat.ns.insc VALUES (1, 10, 'a')")
    Seq((1L, 5), (7L, 70)).toDF("k", "small")
      .createOrReplaceTempView("__insc_src")
    // 'small' is INT; the BIGINT target column takes the assignment-cast
    spark.sql("""MERGE INTO ecat.ns.insc t USING __insc_src s ON t.k = s.k
                 WHEN NOT MATCHED THEN INSERT (k, cents)
                   VALUES (s.k, s.small)""")
    val rows = spark.sql("SELECT k, cents, tag FROM ecat.ns.insc")
      .as[(Long, Long, Option[String])].collect()
      .map { case (k, c, t) => k -> ((c, t)) }.toMap
    assert(rows === Map(1L -> ((10L, Some("a"))), 7L -> ((70L, None))))
  }

  test("column-level INSERT must assign every merge key, identity from " +
      "the source; by-source UPDATE may not rekey") {
    root
    spark.sql("CREATE TABLE ecat.ns.insr (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.insr VALUES (1, 10)")
    Seq((2L, 20L)).toDF("k", "cents").createOrReplaceTempView("__insr_src")
    val e1 = intercept[Exception](
      spark.sql("""MERGE INTO ecat.ns.insr t USING __insr_src s ON t.k = s.k
                   WHEN NOT MATCHED THEN INSERT (cents) VALUES (s.cents)"""))
    assert(e1.getMessage.contains("must assign merge key"))
    val e2 = intercept[Exception](
      spark.sql("""MERGE INTO ecat.ns.insr t USING __insr_src s ON t.k = s.k
                   WHEN NOT MATCHED THEN INSERT (k, cents)
                     VALUES (s.k + 1000, s.cents)"""))
    assert(e2.getMessage.contains("same-named column"))
    val e3 = intercept[Exception](
      spark.sql("""MERGE INTO ecat.ns.insr t USING __insr_src s ON t.k = s.k
                   WHEN NOT MATCHED BY SOURCE THEN UPDATE SET k = 99"""))
    assert(e3.getMessage.contains("merge key"))
  }

  test("full merge program against an empty shell: by-source clauses " +
      "no-op, column-level insert lands, typo'd SET still refused") {
    root
    spark.sql("CREATE TABLE ecat.ns.shell4 (k BIGINT, cents BIGINT)")
    Seq((5L, 50L)).toDF("k", "cents").createOrReplaceTempView("__sh2_src")
    spark.sql("""MERGE INTO ecat.ns.shell4 t USING __sh2_src s ON t.k = s.k
                 WHEN NOT MATCHED THEN INSERT (k, cents)
                   VALUES (s.k, s.cents * 2)
                 WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(rowsOf("ecat.ns.shell4") === Map(5L -> 100L))
    spark.sql("CREATE TABLE ecat.ns.shell5 (k BIGINT, cents BIGINT)")
    val e = intercept[Exception](
      spark.sql("""MERGE INTO ecat.ns.shell5 t USING __sh2_src s
                   ON t.k = s.k
                   WHEN NOT MATCHED BY SOURCE
                     THEN UPDATE SET nope = 1""")) // must fail even empty
    assert(e.getMessage.contains("nope"))
  }

  // ---- round 16: dynamic INSERT OVERWRITE ---------------------------

  private def withDynamicMode[A](body: => A): A = {
    val prev = spark.conf.get(
      "spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try body
    finally spark.conf.set(
      "spark.sql.sources.partitionOverwriteMode", prev)
  }

  test("dynamic INSERT OVERWRITE replaces exactly the staged partitions " +
      "in one snapshot commit; an empty source is a no-op, not a " +
      "truncate") {
    root
    spark.sql("""CREATE TABLE ecat.ns.dyn (k BIGINT, cents BIGINT,
                 p STRING) PARTITIONED BY (p)""")
    spark.sql("""INSERT INTO ecat.ns.dyn VALUES
                 (1, 10, 'a'), (2, 20, 'a'), (3, 30, 'b'), (4, 40, 'c')""")
    val v0 = Manifest.currentVersion(spark, s"$root/ns/dyn").get
    withDynamicMode {
      spark.sql("""INSERT OVERWRITE ecat.ns.dyn VALUES (9, 90, 'a')""")
    }
    // partition a replaced wholesale (rows 1, 2 gone), b and c intact
    assert(spark.sql("SELECT k, cents FROM ecat.ns.dyn ORDER BY k")
      .as[(Long, Long)].collect().toSeq ===
      Seq((3L, 30L), (4L, 40L), (9L, 90L)))
    // exactly one commit, and the pre-overwrite snapshot time-travels
    assert(Manifest.currentVersion(spark, s"$root/ns/dyn").get === v0 + 1)
    assert(spark.sql(
      s"SELECT count(*) FROM ecat.ns.dyn VERSION AS OF $v0")
      .as[Long].head() === 4L)
    // an empty source stages no partitions → nothing replaced (the
    // static-mode hazard this mode exists to avoid)
    withDynamicMode {
      spark.sql("""INSERT OVERWRITE ecat.ns.dyn
                   SELECT k, cents, p FROM ecat.ns.dyn WHERE k > 999""")
    }
    assert(spark.sql("SELECT count(*) FROM ecat.ns.dyn")
      .as[Long].head() === 3L)
    // static mode on the same table still means whole-table replace
    spark.sql("""INSERT OVERWRITE ecat.ns.dyn VALUES (7, 70, 'b')""")
    assert(spark.sql("SELECT k FROM ecat.ns.dyn").as[Long].collect()
      .toSeq === Seq(7L))
  }

  test("dynamic INSERT OVERWRITE on a TWO-LEVEL layout replaces leaf " +
      "partitions only — sibling leaves under the same first level " +
      "survive") {
    root
    spark.sql("""CREATE TABLE ecat.ns.dyn2 (k BIGINT, cents BIGINT,
                 d DATE, pri STRING) PARTITIONED BY (d, pri)""")
    spark.sql("""INSERT INTO ecat.ns.dyn2 VALUES
                 (1, 10, DATE'2024-07-01', 'a'),
                 (2, 20, DATE'2024-07-01', 'b'),
                 (3, 30, DATE'2024-07-02', 'a')""")
    withDynamicMode {
      spark.sql("""INSERT OVERWRITE ecat.ns.dyn2 VALUES
                   (9, 90, DATE'2024-07-01', 'a')""")
    }
    // leaf (07-01, a) replaced; its SIBLING (07-01, b) and the other
    // date survive — a first-level-wholesale replace would be wrong
    assert(spark.sql("SELECT k, cents FROM ecat.ns.dyn2 ORDER BY k")
      .as[(Long, Long)].collect().toSeq ===
      Seq((2L, 20L), (3L, 30L), (9L, 90L)))
  }

  test("dynamic INSERT OVERWRITE on an unpartitioned table never " +
      "half-replaces: loud refusal or a clean whole-table replace") {
    root
    spark.sql("CREATE TABLE ecat.ns.dyn_flat (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.dyn_flat VALUES (1, 10)")
    // unpartitioned + dynamic mode: depending on Spark's analysis the
    // statement either reaches our command (which refuses, layout
    // Seq()) or degrades to the static whole-table overwrite — both
    // are sound; a half-replaced table is not
    val outcome =
      try {
        withDynamicMode {
          spark.sql("INSERT OVERWRITE ecat.ns.dyn_flat VALUES (2, 20)")
        }
        None
      } catch { case e: Exception => Some(e) }
    outcome match {
      case Some(e) =>
        assert(e.getMessage.toLowerCase.contains("unpartitioned"),
          s"unexpected refusal: ${e.getMessage}")
        assert(rowsOf("ecat.ns.dyn_flat") === Map(1L -> 10L),
          "a refused overwrite must leave the snapshot untouched")
      case None =>
        assert(rowsOf("ecat.ns.dyn_flat") === Map(2L -> 20L),
          "a non-refused dynamic overwrite of an unpartitioned table " +
            "must be the clean whole-table replace")
    }
  }

  // ---- round 16: correlated EXISTS edges ----------------------------

  test("NOT EXISTS with a NULL outer key matches (no row equals NULL), " +
      "EXISTS with it never matches — the null-safe complement") {
    root
    spark.sql("CREATE TABLE ecat.ns.nex (k BIGINT, cents BIGINT)")
    spark.sql(
      "INSERT INTO ecat.ns.nex VALUES (1, 10), (2, 20), (NULL, 99)")
    Seq(1L).toDF("k").createOrReplaceTempView("__nex_keys")
    // EXISTS: NULL key row must NOT match (s.k = NULL is never true)
    spark.sql("""DELETE FROM ecat.ns.nex t
                 WHERE EXISTS (SELECT 1 FROM __nex_keys s
                               WHERE s.k = t.k)""")
    assert(spark.sql(
      "SELECT coalesce(k, -1), cents FROM ecat.ns.nex ORDER BY 1")
      .as[(Long, Long)].collect().toSeq ===
      Seq((-1L, 99L), (2L, 20L)))
    // NOT EXISTS: the NULL key row HAS no match, so it must match the
    // complement and be deleted — a plain IN-list NULL would wrongly
    // keep it (tri-state NULL), the <=> TRUE pin makes it FALSE
    spark.sql("""DELETE FROM ecat.ns.nex t
                 WHERE NOT EXISTS (SELECT 1 FROM __nex_keys s
                                   WHERE s.k = t.k)""")
    assert(spark.sql("SELECT count(*) FROM ecat.ns.nex")
      .as[Long].head() === 0L)
  }

  // ---- round 17: REPLACE WHERE (expression-scoped overwrite) --------

  test("REPLACE WHERE: delete-by-predicate + append in ONE snapshot " +
      "commit; time travel across it; the leak check refuses staged " +
      "rows outside the region pre-commit") {
    root
    spark.sql("CREATE TABLE ecat.ns.rw (k BIGINT, cents BIGINT, " +
      "pri STRING)")
    spark.sql("""INSERT INTO ecat.ns.rw
                 VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'a')""")
    val path = s"$root/ns/rw"
    val vBefore = Manifest.currentVersion(spark, path).get
    Seq((9L, 90L, "a")).toDF("k", "cents", "pri")
      .writeTo("ecat.ns.rw").overwrite($"pri" === "a")
    assert(spark.sql("SELECT k, cents, pri FROM ecat.ns.rw ORDER BY k")
      .as[(Long, Long, String)].collect().toSeq ===
      Seq((2L, 20L, "b"), (9L, 90L, "a")))
    // ONE commit: delete + append are not two versions
    assert(Manifest.currentVersion(spark, path).get === vBefore + 1)
    // time travel: the pre-replace snapshot is intact
    assert(spark.sql(
      s"SELECT k FROM ecat.ns.rw VERSION AS OF $vBefore ORDER BY k")
      .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
    // leak check: a staged row NOT satisfying the predicate refuses
    // loudly and leaves the snapshot untouched (it would survive the
    // next identical replace and duplicate)
    val e = intercept[Exception](
      Seq((7L, 70L, "zzz")).toDF("k", "cents", "pri")
        .writeTo("ecat.ns.rw").overwrite($"pri" === "a"))
    assert(e.getMessage.contains("replace"), e.getMessage)
    assert(spark.sql("SELECT count(*) FROM ecat.ns.rw").as[Long].head()
      === 2L)
    assert(Manifest.currentVersion(spark, path).get === vBefore + 1)
  }

  test("REPLACE WHERE on a hidden-transform layout: row-scoped, so " +
      "co-bucketed strangers survive — the safe alternative the " +
      "dynamic-overwrite refusal points at") {
    root
    spark.sql("""CREATE TABLE ecat.ns.rwb (k BIGINT, cents BIGINT,
                 pri STRING) PARTITIONED BY (bucket(4, k))""")
    // k = 1, 5, 9 share bucket 1; 9 is a 'b' row co-bucketed with the
    // 'a' region being replaced
    spark.sql("""INSERT INTO ecat.ns.rwb
                 VALUES (1, 10, 'a'), (5, 50, 'a'), (9, 90, 'b'),
                        (2, 20, 'b')""")
    // dynamic overwrite on this layout refuses (co-bucketed-rows
    // footgun) — REPLACE WHERE is the supported idiom
    Seq((1L, 11L, "a"), (5L, 51L, "a")).toDF("k", "cents", "pri")
      .writeTo("ecat.ns.rwb").overwrite($"pri" === "a")
    assert(spark.sql("SELECT k, cents, pri FROM ecat.ns.rwb ORDER BY k")
      .as[(Long, Long, String)].collect().toSeq ===
      Seq((1L, 11L, "a"), (2L, 20L, "b"), (5L, 51L, "a"),
        (9L, 90L, "b")),
      "the co-bucketed 'b' rows must survive byte-equal")
    // the layout stays hidden-transform after the rewrite
    assert(Manifest.currentLive(spark, s"$root/ns/rwb")
      .forall(_.startsWith("ptx_bucket4_k=")))
  }

  // ---- round 17: distributed DML membership (key sets past the cap) --

  /** Force every membership subquery through the distributed-join
    * fallback (caps below any real key set), restoring the session
    * confs afterwards.
    */
  private def withLowCaps[A](f: => A): A = {
    val pk = spark.conf.getOption("spark.graft.dml.exists.maxKeys")
    val pr = spark.conf.getOption("spark.graft.dml.subquery.maxRows")
    spark.conf.set("spark.graft.dml.exists.maxKeys", "1")
    spark.conf.set("spark.graft.dml.subquery.maxRows", "1")
    try f
    finally {
      pk.fold(spark.conf.unset("spark.graft.dml.exists.maxKeys"))(
        spark.conf.set("spark.graft.dml.exists.maxKeys", _))
      pr.fold(spark.conf.unset("spark.graft.dml.subquery.maxRows"))(
        spark.conf.set("spark.graft.dml.subquery.maxRows", _))
    }
  }

  test("distributed EXISTS / NOT EXISTS (key set past the cap): " +
      "NULL-key semantics identical to the literal path") {
    root
    spark.sql("CREATE TABLE ecat.ns.dexb (k BIGINT, cents BIGINT)")
    spark.sql("""INSERT INTO ecat.ns.dexb
                 VALUES (1, 10), (2, 20), (3, 30), (NULL, 99)""")
    Seq(1L, 3L).toDF("k").createOrReplaceTempView("__dexb_keys")
    withLowCaps {
      // EXISTS joins on plain equality: 1 and 3 match and go; the NULL
      // key row can never match (s.k = NULL is never true) and stays
      spark.sql("""DELETE FROM ecat.ns.dexb t
                   WHERE EXISTS (SELECT 1 FROM __dexb_keys s
                                 WHERE s.k = t.k)""")
    }
    assert(spark.sql(
      "SELECT coalesce(k, -1), cents FROM ecat.ns.dexb ORDER BY 1")
      .as[(Long, Long)].collect().toSeq ===
      Seq((-1L, 99L), (2L, 20L)))
    withLowCaps {
      // NOT EXISTS through the join: the unmatched marker reads FALSE
      // (not NULL) via <=> TRUE, so both survivors — including the
      // NULL-key row — are updated
      spark.sql("""UPDATE ecat.ns.dexb t SET cents = cents + 1
                   WHERE NOT EXISTS (SELECT 1 FROM __dexb_keys s
                                     WHERE s.k = t.k)""")
    }
    assert(spark.sql(
      "SELECT coalesce(k, -1), cents FROM ecat.ns.dexb ORDER BY 1")
      .as[(Long, Long)].collect().toSeq ===
      Seq((-1L, 100L), (2L, 21L)))
  }

  test("distributed IN keeps SQL's three-valued logic: NOT IN with a " +
      "NULL in the subquery deletes nothing, IN skips the no-match rows") {
    root
    spark.sql("CREATE TABLE ecat.ns.dinb (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.dinb VALUES (1, 10), (2, 20)")
    Seq(Option(1L), Option.empty[Long]).toDF("k")
      .createOrReplaceTempView("__dinb_keys")
    withLowCaps {
      // k NOT IN {1, NULL}: 1 → NOT(true) = false; 2 → NOT(NULL) = NULL
      // — neither is TRUE, so the delete must be a no-op (the classic
      // NOT-IN-with-NULL trap; a marker without the has-NULL CASE would
      // wrongly delete row 2)
      spark.sql("""DELETE FROM ecat.ns.dinb
                   WHERE k NOT IN (SELECT k FROM __dinb_keys)""")
    }
    assert(rowsOf("ecat.ns.dinb") === Map(1L -> 10L, 2L -> 20L))
    withLowCaps {
      // k IN {1, NULL}: 1 → true (deleted); 2 → NULL (kept)
      spark.sql("""DELETE FROM ecat.ns.dinb
                   WHERE k IN (SELECT k FROM __dinb_keys)""")
    }
    assert(rowsOf("ecat.ns.dinb") === Map(2L -> 20L))
  }

  test("distributed EXISTS over a composite correlation key") {
    root
    spark.sql(
      "CREATE TABLE ecat.ns.dmk (k BIGINT, p STRING, cents BIGINT)")
    spark.sql("""INSERT INTO ecat.ns.dmk
                 VALUES (1, 'a', 10), (1, 'b', 20), (2, 'a', 30)""")
    Seq((1L, "a"), (2L, "a")).toDF("k", "p")
      .createOrReplaceTempView("__dmk_keys")
    withLowCaps {
      spark.sql("""DELETE FROM ecat.ns.dmk t
                   WHERE EXISTS (SELECT 1 FROM __dmk_keys s
                                 WHERE s.k = t.k AND s.p = t.p)""")
    }
    assert(spark.sql("SELECT k, p, cents FROM ecat.ns.dmk")
      .as[(Long, String, Long)].collect().toSeq === Seq((1L, "b", 20L)))
  }

  test("nondeterministic membership refuses loudly: a rand() correlation " +
      "conjunct at analysis, a rand() key subquery past the cap at run") {
    root
    spark.sql("CREATE TABLE ecat.ns.dnd (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO ecat.ns.dnd VALUES (1, 10)")
    Seq(5L, 6L).toDF("k").createOrReplaceTempView("__dnd_keys")
    // ADVICE r16: `t.k = rand()` is outer-vs-inner in SHAPE, but the
    // decorrelation would evaluate the inner side once where EXISTS
    // semantics evaluate it per outer row — must refuse, not rewrite
    val e1 = intercept[Exception](
      spark.sql("""DELETE FROM ecat.ns.dnd t
                   WHERE EXISTS (SELECT 1 FROM __dnd_keys s
                                 WHERE t.k = CAST(rand() * 10 AS BIGINT))"""))
    assert(e1.getMessage.contains("decorrelate"), e1.getMessage)
    // a nondeterministic key subquery past the literal cap would run
    // TWICE (discovery + rewrite) with two different key sets — refuse
    withLowCaps {
      val e2 = intercept[Exception](
        spark.sql("""DELETE FROM ecat.ns.dnd
                     WHERE k IN (SELECT CAST(rand() * 10 AS BIGINT)
                                 FROM __dnd_keys)"""))
      assert(e2.getMessage.contains("deterministic"), e2.getMessage)
    }
    assert(rowsOf("ecat.ns.dnd") === Map(1L -> 10L),
      "refused statements must leave the snapshot untouched")
  }

  test("semantically trivial DELETE predicates route like DELETE FROM t " +
      "on merge-on-read tables (ADVICE r17: fold before deciding)") {
    root
    spark.sql("""CREATE TABLE ecat.ns.mor_triv (k BIGINT, cents BIGINT)
                 TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')""")
    spark.range(0, 50).selectExpr("id AS k", "id * 10 AS cents")
      .createOrReplaceTempView("__triv_src")
    spark.sql("INSERT INTO ecat.ns.mor_triv SELECT k, cents FROM __triv_src")
    // cap far below the row count: an accidental DV route would refuse
    spark.conf.set("spark.graft.dml.dv.maxRows", "5")
    try {
      spark.sql("DELETE FROM ecat.ns.mor_triv WHERE 1=1")
      assert(spark.sql("SELECT count(*) FROM ecat.ns.mor_triv")
        .as[Long].head() === 0L)
      val p = s"$root/ns/mor_triv"
      val v = Manifest.currentVersion(spark, p).get
      assert(Manifest.dvsAsOf(spark, p, v).isEmpty,
        "a trivially-true DELETE must take the empty-snapshot commit, " +
          "not DV every row")
      // the OR-tautology shape folds too
      spark.sql("INSERT INTO ecat.ns.mor_triv SELECT k, cents FROM __triv_src")
      spark.sql("DELETE FROM ecat.ns.mor_triv WHERE true OR cents IS NULL")
      assert(spark.sql("SELECT count(*) FROM ecat.ns.mor_triv")
        .as[Long].head() === 0L)
      assert(Manifest.dvsAsOf(spark, p,
        Manifest.currentVersion(spark, p).get).isEmpty)
      // a REAL predicate still routes merge-on-read under the tiny cap
      spark.sql("INSERT INTO ecat.ns.mor_triv SELECT k, cents FROM __triv_src")
      spark.sql("DELETE FROM ecat.ns.mor_triv WHERE k < 3")
      assert(Manifest.dvsAsOf(spark, p,
        Manifest.currentVersion(spark, p).get).nonEmpty)
      assert(spark.sql("SELECT count(*) FROM ecat.ns.mor_triv")
        .as[Long].head() === 47L)
    } finally spark.conf.unset("spark.graft.dml.dv.maxRows")
  }
}
