package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Manifest, PartitionTransforms, Upsert}

/** Hidden partition transforms (round 15): `PARTITIONED BY (days(ts),
  * bucket(n, k))` lays rows out under engine-maintained `ptx_*`
  * directories that (a) never surface in the logical schema, (b) are
  * re-derived by every write funnel (insert, overwrite, merge/delete
  * rewrites), and (c) prune the snapshot's file list when a predicate
  * constrains the SOURCE column — day/hour ranges by monotone mapping,
  * bucket by hashing the literal. Iceberg-style hidden partitioning,
  * restated over the physical-directory manifest engine.
  */
class HiddenPartitionSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-hp").toString
    spark.conf.set("spark.sql.catalog.hcat", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.hcat.root", r)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS hcat.ns")
    r
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def finalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  private def filesScanned(df: org.apache.spark.sql.DataFrame): Int =
    collect(finalPlan(df)) {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        s.scan
    }.collect {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.fileIndex.inputFiles.length
    }.sum

  test("days+bucket layout: writes land ptx_* dirs, the logical schema " +
      "hides them, and values round-trip") {
    root
    spark.sql("""CREATE TABLE hcat.ns.ev (k BIGINT, ts TIMESTAMP,
                 v BIGINT) PARTITIONED BY (days(ts), bucket(4, k))""")
    Seq(
      (1L, ts("2024-07-01 10:00:00"), 10L),
      (2L, ts("2024-07-01 11:00:00"), 20L),
      (3L, ts("2024-07-02 09:00:00"), 30L),
      (4L, ts("2024-07-03 09:00:00"), 40L))
      .toDF("k", "ts", "v").createOrReplaceTempView("__hp_src")
    spark.sql("INSERT INTO hcat.ns.ev SELECT k, ts, v FROM __hp_src")
    val p = s"$root/ns/ev"
    val live = Manifest.currentLive(spark, p)
    assert(live.forall(_.matches("ptx_day_ts=2024-07-0[123]/ptx_bucket4_k=\\d/.*")),
      s"unexpected layout: ${live.mkString(", ")}")
    // the logical surface never shows the derived dirs
    assert(spark.table("hcat.ns.ev").columns.toSeq === Seq("k", "ts", "v"))
    assert(spark.sql("SELECT * FROM hcat.ns.ev").columns.toSeq
      === Seq("k", "ts", "v"))
    assert(spark.sql("SELECT k, v FROM hcat.ns.ev ORDER BY k")
      .as[(Long, Long)].collect().toSeq
      === Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    // library read hides them too
    assert(Manifest.read(spark, p).columns.toSeq === Seq("k", "ts", "v"))
  }

  test("a day-range predicate on the SOURCE column prunes the file " +
      "list; a bucket-key equality prunes to the matching bucket") {
    root // same table as above — created there if this runs first
    if (!spark.catalog.tableExists("hcat.ns.ev")) {
      spark.sql("""CREATE TABLE hcat.ns.ev (k BIGINT, ts TIMESTAMP,
                   v BIGINT) PARTITIONED BY (days(ts), bucket(4, k))""")
      Seq(
        (1L, ts("2024-07-01 10:00:00"), 10L),
        (2L, ts("2024-07-01 11:00:00"), 20L),
        (3L, ts("2024-07-02 09:00:00"), 30L),
        (4L, ts("2024-07-03 09:00:00"), 40L))
        .toDF("k", "ts", "v").createOrReplaceTempView("__hp_src0")
      spark.sql("INSERT INTO hcat.ns.ev SELECT k, ts, v FROM __hp_src0")
    }
    val p = s"$root/ns/ev"
    val total = Manifest.currentLive(spark, p).size
    val dayQ = spark.sql("""SELECT sum(v) FROM hcat.ns.ev
      WHERE ts >= TIMESTAMP'2024-07-03 00:00:00'""")
    assert(dayQ.as[Long].head() === 40L)
    val dayFiles = filesScanned(dayQ)
    assert(dayFiles < total,
      s"day predicate should prune ($dayFiles of $total scanned)")
    val keyQ = spark.sql("SELECT v FROM hcat.ns.ev WHERE k = 2")
    assert(keyQ.as[Long].collect().toSeq === Seq(20L))
    val keyFiles = filesScanned(keyQ)
    assert(keyFiles < total,
      s"bucket equality should prune ($keyFiles of $total scanned)")
  }

  test("merge and delete rewrites re-derive the hidden layout") {
    root
    spark.sql("""CREATE TABLE hcat.ns.mx (k BIGINT, ts TIMESTAMP,
                 v BIGINT) PARTITIONED BY (days(ts))""")
    Seq((1L, ts("2024-07-01 08:00:00"), 10L),
      (2L, ts("2024-07-02 08:00:00"), 20L))
      .toDF("k", "ts", "v").createOrReplaceTempView("__mx_src")
    spark.sql("INSERT INTO hcat.ns.mx SELECT * FROM __mx_src")
    Seq((2L, ts("2024-07-02 08:00:00"), 999L),
      (5L, ts("2024-07-05 08:00:00"), 50L))
      .toDF("k", "ts", "v").createOrReplaceTempView("__mx_merge")
    spark.sql("""MERGE INTO hcat.ns.mx t USING __mx_merge s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT *""")
    val p = s"$root/ns/mx"
    val live = Manifest.currentLive(spark, p)
    assert(live.forall(_.startsWith("ptx_day_ts=")),
      s"rewrites must keep the hidden layout: ${live.mkString(", ")}")
    assert(live.exists(_.startsWith("ptx_day_ts=2024-07-05/")),
      "the merge insert must land in its own day dir")
    assert(spark.sql("SELECT k, v FROM hcat.ns.mx ORDER BY k")
      .as[(Long, Long)].collect().toSeq
      === Seq((1L, 10L), (2L, 999L), (5L, 50L)))
    spark.sql("DELETE FROM hcat.ns.mx WHERE v = 999")
    assert(Manifest.currentLive(spark, p)
      .forall(_.startsWith("ptx_day_ts=")))
    assert(spark.sql("SELECT count(*) FROM hcat.ns.mx")
      .as[Long].head() === 2L)
    // SQL UPDATE's touched-files rewrite re-derives the layout too
    spark.sql("UPDATE hcat.ns.mx SET v = v * 2 WHERE k = 1")
    assert(spark.sql("SELECT v FROM hcat.ns.mx WHERE k = 1")
      .as[Long].head() === 20L)
    assert(Manifest.currentLive(spark, p)
      .forall(_.startsWith("ptx_day_ts=")))
  }

  test("schema migrations refuse a transform's source column; other " +
      "columns stay migratable") {
    root
    spark.sql("""CREATE TABLE hcat.ns.sm (k BIGINT, ts TIMESTAMP,
                 v INT) PARTITIONED BY (days(ts), bucket(4, k))""")
    Seq((1L, ts("2024-07-01 08:00:00"), 10)).toDF("k", "ts", "v")
      .createOrReplaceTempView("__sm_src")
    spark.sql("INSERT INTO hcat.ns.sm SELECT * FROM __sm_src")
    val p = s"$root/ns/sm"
    def refuses(body: => Any): Unit = {
      val e = intercept[Exception](body)
      assert(e.getMessage.contains("transform") ||
        e.getMessage.contains("partition"), e.getMessage)
    }
    refuses(Manifest.renameColumn(spark, p, "ts", "when_at"))
    refuses(Manifest.dropColumn(spark, p, "ts"))
    refuses(Manifest.widenColumn(spark, p, "k",
      org.apache.spark.sql.types.DecimalType(20, 0)))
    // a non-layout column still widens
    Manifest.widenColumn(spark, p, "v",
      org.apache.spark.sql.types.LongType)
    assert(spark.sql("SELECT v FROM hcat.ns.sm").schema("v").dataType
      === org.apache.spark.sql.types.LongType)
    // … and still renames: the rename-chain union read composes with
    // the hidden layout (prior-name coalesce over ptx_* dirs)
    spark.sql("ALTER TABLE hcat.ns.sm RENAME COLUMN v TO val")
    assert(spark.sql("SELECT CAST(sum(val) AS BIGINT) FROM hcat.ns.sm")
      .as[Long].head() === 10L)
    assert(!spark.table("hcat.ns.sm").columns.contains("v"))
  }

  test("pruneFiles is a SUPERSET of the exact day filter on random " +
      "data (property)") {
    import PartitionTransforms._
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThanOrEqual, LessThanOrEqual, Literal}
    import org.apache.spark.sql.types.TimestampType
    val rnd = new scala.util.Random(77)
    val tsAttr = AttributeReference("ts", TimestampType)()
    (1 to 50).foreach { round =>
      // random day-partitioned file list over a two-year window
      val days = Seq.fill(rnd.nextInt(20) + 1)(rnd.nextInt(730))
        .distinct.sorted
      val files = days.map(d => (d,
        s"ptx_day_ts=${java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong)}" +
          s"/f$d.parquet"))
      // random closed ts range inside (and sometimes outside) the window
      val lo = rnd.nextInt(800) - 30
      val hi = lo + rnd.nextInt(120)
      def micros(day: Int, secs: Int): Long =
        (java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
          .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond +
          secs) * 1000000L
      val preds = Seq(
        GreaterThanOrEqual(tsAttr,
          Literal(micros(lo, rnd.nextInt(86400)), TimestampType)),
        LessThanOrEqual(tsAttr,
          Literal(micros(hi, rnd.nextInt(86400)), TimestampType)))
      val kept = pruneFiles(files.map(_._2), preds).toSet
      // exact model: a day-dir may hold matching rows iff it
      // intersects [lo, hi] (whole-day granularity)
      files.foreach { case (d, f) =>
        if (d >= lo && d <= hi)
          assert(kept.contains(f),
            s"round $round: pruned a file that can match (day $d in " +
              s"[$lo,$hi])")
      }
    }
  }

  test("the canonical SCD1 MERGE (SET * / INSERT *) works on a single " +
      "hidden-transform layout (routes to the generalized rewrite)") {
    root
    spark.sql("""CREATE TABLE hcat.ns.scd1 (k BIGINT, ts TIMESTAMP,
                 v BIGINT) PARTITIONED BY (days(ts))""")
    Seq((1L, ts("2024-07-01 08:00:00"), 10L))
      .toDF("k", "ts", "v").createOrReplaceTempView("__scd1_src")
    spark.sql("INSERT INTO hcat.ns.scd1 SELECT * FROM __scd1_src")
    Seq((1L, ts("2024-07-01 08:00:00"), 99L),
      (2L, ts("2024-07-02 08:00:00"), 20L))
      .toDF("k", "ts", "v").createOrReplaceTempView("__scd1_m")
    // pre-fix this demanded the internal ptx_day_ts dir be a merge key
    spark.sql("""MERGE INTO hcat.ns.scd1 t USING __scd1_m s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT k, v FROM hcat.ns.scd1 ORDER BY k")
      .as[(Long, Long)].collect().toSeq === Seq((1L, 99L), (2L, 20L)))
    assert(Manifest.currentLive(spark, s"$root/ns/scd1")
      .forall(_.startsWith("ptx_day_ts=")))
  }

  test("compaction preserves the hidden layout and re-derives the " +
      "transform columns") {
    val p = Files.createTempDirectory("graft-hpc").resolve("t").toString
    // five single-row appends into one day = small-file debt
    (1 to 5).foreach { i =>
      Upsert.appendLayout(spark, p,
        Seq((i.toLong, ts("2024-07-01 10:00:00"), i * 10L))
          .toDF("k", "ts", "v"),
        Seq("ptx_day_ts"))
    }
    Upsert.appendLayout(spark, p,
      Seq((9L, ts("2024-07-02 10:00:00"), 90L)).toDF("k", "ts", "v"),
      Seq("ptx_day_ts"))
    assert(Manifest.currentLive(spark, p).size === 6)
    val (before, after) = graft.engine.Compaction.compact(spark, p)
    assert(before === 6L && after < 6L)
    val live = Manifest.currentLive(spark, p)
    assert(live.forall(_.startsWith("ptx_day_ts=")),
      s"compaction flattened the hidden layout: ${live.mkString(", ")}")
    assert(live.exists(_.startsWith("ptx_day_ts=2024-07-02/")))
    assert(Manifest.read(spark, p).agg(
      org.apache.spark.sql.functions.sum("v")).as[Long].head() === 240L)
    assert(Manifest.read(spark, p).columns.toSeq === Seq("k", "ts", "v"))
  }

  test("exactly-once epoch appends land under the hidden layout") {
    val p = Files.createTempDirectory("graft-hpe").resolve("t").toString
    val batch = Seq((1L, ts("2024-07-01 10:00:00"), 10L))
      .toDF("k", "ts", "v")
    assert(Upsert.appendEpoch(spark, p, batch, Some("ptx_day_ts"),
      "appA", 0L))
    // replay of the same epoch is a detected no-op
    assert(!Upsert.appendEpoch(spark, p, batch, Some("ptx_day_ts"),
      "appA", 0L))
    assert(Manifest.currentLive(spark, p)
      .forall(_.startsWith("ptx_day_ts=2024-07-01/")))
    assert(Manifest.read(spark, p).count() === 1L)
  }

  test("library-level transforms: materialize derives, decode round-" +
      "trips, pruneFiles is superset-safe") {
    import PartitionTransforms._
    assert(decode("ptx_day_ts") === Some(PTime("day", "ts")))
    assert(decode("ptx_bucket16_user_id") === Some(PBucket(16, "user_id")))
    assert(decode("country") === None)
    assert(transformSources(Seq("ptx_day_ts", "country"))
      === Seq("ts"))
    val df = Seq((7L, ts("2024-07-01 10:30:00"))).toDF("k", "ts")
    val m = materialize(df, Seq("ptx_day_ts", "ptx_bucket4_k"))
    val row = m.select("ptx_day_ts", "ptx_bucket4_k")
      .as[(java.sql.Date, Int)].head()
    assert(row._1 === java.sql.Date.valueOf("2024-07-01"))
    assert(row._2 >= 0 && row._2 < 4)
    // a predicate on an untransformed column prunes nothing
    val files = Seq(
      "ptx_day_ts=2024-07-01/a.parquet",
      "ptx_day_ts=2024-07-02/b.parquet",
      "ptx_day_ts=__HIVE_DEFAULT_PARTITION__/c.parquet")
    import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, Literal}
    import org.apache.spark.sql.types.DateType
    val tsAttr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "ts", DateType)()
    val pred = GreaterThanOrEqual(tsAttr,
      Literal.create(java.sql.Date.valueOf("2024-07-04"), DateType))
    val kept = pruneFiles(files, Seq(pred))
    // 07-01 falls out even with the one-day slack; NULL dir always kept
    assert(kept ===
      Seq("ptx_day_ts=__HIVE_DEFAULT_PARTITION__/c.parquet"))
  }
}
