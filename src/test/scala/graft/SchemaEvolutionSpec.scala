package graft

import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{FileStats, Manifest, Upsert, WriterLease}

/** Schema evolution as an explicit manifest migration (round 11):
  * `Manifest.addColumn` is metadata-only (same file list, one new
  * version pinning the widened schema), old rows read the new column as
  * NULL, time travel keeps the old shape, the drift gate now enforces
  * the EVOLVED schema, and per-file skipping stats carry forward across
  * unrelated commits because data files are immutable.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-schevo").resolve("t").toString

  private val d1 = Date.valueOf("2024-06-01")
  private val d2 = Date.valueOf("2024-06-02")

  test("addColumn is metadata-only and null-backfills at read") {
    val path = tmp()
    Upsert.upsertPartitioned(spark, path,
      Seq((1, d1, 100L), (2, d2, 200L)).toDF("k", "d", "cents"),
      Seq("k", "d"), "d")
    val filesBefore = Manifest.currentLive(spark, path).sorted
    val v2 = Manifest.addColumn(spark, path,
      StructField("discount", LongType, nullable = true))
    assert(Manifest.currentVersion(spark, path) === Some(v2))
    // metadata-only: the live file list is bit-identical
    assert(Manifest.currentLive(spark, path).sorted === filesBefore)
    val now = Manifest.read(spark, path)
    assert(now.columns.contains("discount"))
    assert(now.filter(col("discount").isNull).count() === 2)
    // time travel to the pre-migration version keeps the old shape
    val v1 = Manifest.versions(spark, path).head
    assert(!Manifest.readAsOf(spark, path, v1).columns.contains("discount"))
  }

  test("after migration the drift gate enforces the evolved schema") {
    val path = tmp()
    Upsert.upsertPartitioned(spark, path,
      Seq((1, d1, 100L)).toDF("k", "d", "cents"), Seq("k", "d"), "d")
    Manifest.addColumn(spark, path,
      StructField("discount", LongType, nullable = true))
    // old-shape batch: rejected, pointing at the migration contract
    val e = intercept[IllegalArgumentException] {
      Upsert.upsertPartitioned(spark, path,
        Seq((9, d2, 900L)).toDF("k", "d", "cents"), Seq("k", "d"), "d")
    }
    assert(e.getMessage.contains("schema drift"))
    // new-shape batch: lands; old row keeps NULL, new row carries value
    Upsert.upsertPartitioned(spark, path,
      Seq((9, d2, 900L, 5L)).toDF("k", "d", "cents", "discount"),
      Seq("k", "d"), "d")
    val got = Manifest.read(spark, path)
      .select("k", "discount").as[(Int, Option[Long])].collect().toMap
    assert(got === Map(1 -> None, 9 -> Some(5L)))
    // merge path replaces under the evolved schema too
    Upsert.mergePartitioned(spark, path,
      Seq((1, d1, 111L, 7L)).toDF("k", "d", "cents", "discount"),
      Seq("k", "d"), "d")
    val merged = Manifest.read(spark, path)
      .select("k", "discount").as[(Int, Option[Long])].collect().toMap
    assert(merged === Map(1 -> Some(7L), 9 -> Some(5L)))
  }

  test("addColumn rejects duplicates and non-nullable fields") {
    val path = tmp()
    Upsert.upsertParquet(spark, path,
      Seq((1, 10L)).toDF("k", "cents"), Seq("k"))
    intercept[IllegalArgumentException] {
      Manifest.addColumn(spark, path,
        StructField("cents", LongType, nullable = true))
    }
    intercept[IllegalArgumentException] {
      Manifest.addColumn(spark, path,
        StructField("x", LongType, nullable = false))
    }
  }

  test("skipping stats carry forward across commits; migration keeps them") {
    val path = tmp()
    (0 until 256).map(i => (i.toLong, i * 3L)).toDF("k", "v")
      .repartitionByRange(8, col("k")).write.parquet(path)
    WriterLease.withLease(spark, path) {
      val files = Manifest.listDataFiles(spark, path)
      Manifest.commit(spark, path, files,
        FileStats.collect(spark, path, files, Seq("k")))
    }
    val (kept1, total1) =
      Manifest.planSkipping(spark, path, Seq(("k", 0.0, 31.0)))
    assert(kept1.size < total1)
    // a stats-less metadata commit (the migration) must not lose them
    Manifest.addColumn(spark, path,
      StructField("discount", LongType, nullable = true))
    val (kept2, total2) =
      Manifest.planSkipping(spark, path, Seq(("k", 0.0, 31.0)))
    assert(kept2.sorted === kept1.sorted && total2 === total1)
    // an append commit without stats: old files keep envelopes, the new
    // file is conservative-kept
    (1000L until 1010L).map(i => (i, i)).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(path)
    WriterLease.withLease(spark, path) {
      Manifest.commit(spark, path, Manifest.listDataFiles(spark, path))
    }
    val (kept3, total3) =
      Manifest.planSkipping(spark, path, Seq(("k", 0.0, 31.0)))
    assert(total3 === total1 + 1)
    assert(kept3.size === kept1.size + 1,
      "appended stat-less file must be kept; carried envelopes still prune")
    // dropped files' stale entries are filtered at commit: a commit that
    // removes files must not retain their envelopes in the sidecar
    val live = Manifest.currentLive(spark, path)
    val dropped = kept1.head
    WriterLease.withLease(spark, path) {
      Manifest.commit(spark, path, live.filterNot(_ == dropped))
    }
    val v = Manifest.currentVersion(spark, path).get
    assert(!FileStats.read(spark, path, v).contains(dropped))
  }

  // ---- round 15: RENAME / DROP COLUMN as metadata-only migrations ---

  test("renameColumn is metadata-only: old files read under the new " +
      "name, time travel keeps the old shape, appends land renamed") {
    val path = tmp()
    Upsert.upsertPartitioned(spark, path,
      Seq((1, d1, 100L), (2, d2, 200L)).toDF("k", "d", "cents"),
      Seq("k", "d"), "d")
    val filesBefore = Manifest.currentLive(spark, path).sorted
    val vRen = Manifest.renameColumn(spark, path, "cents", "price")
    assert(Manifest.currentLive(spark, path).sorted === filesBefore,
      "rename must not rewrite any data file")
    val now = Manifest.read(spark, path)
    assert(now.columns.toSeq === Seq("k", "price", "d"))
    assert(now.select("k", "price").as[(Int, Long)].collect().toMap
      === Map(1 -> 100L, 2 -> 200L),
      "pre-rename files must surface their data under the new name")
    // time travel to the pre-rename version keeps the old shape
    assert(Manifest.readAsOf(spark, path, vRen - 1).columns
      .contains("cents"))
    // the drift gate now speaks the new name…
    val e = intercept[IllegalArgumentException](
      Upsert.upsertPartitioned(spark, path,
        Seq((3, d1, 300L)).toDF("k", "d", "cents"), Seq("k", "d"), "d"))
    assert(e.getMessage.contains("schema drift"))
    // …and a new-name append mixes generations transparently
    Upsert.upsertPartitioned(spark, path,
      Seq((3, d1, 300L)).toDF("k", "d", "price"), Seq("k", "d"), "d")
    assert(Manifest.read(spark, path).select("k", "price")
      .as[(Int, Long)].collect().toMap
      === Map(1 -> 100L, 2 -> 200L, 3 -> 300L))
    // filters and aggregates on the renamed column see every generation
    assert(Manifest.read(spark, path).filter(col("price") > 150)
      .count() === 2)
  }

  test("a rewrite after rename re-lands old rows under the new name " +
      "(the chain drains as the table churns)") {
    val path = tmp()
    Upsert.upsertParquet(spark, path,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "cents"), Seq("k"))
    Manifest.renameColumn(spark, path, "cents", "price")
    // updateWhere must evaluate against the coalesced logical row…
    val n = Upsert.updateWhere(spark, path, col("k") === 1L,
      Map("price" -> (col("price") + 5L)))
    assert(n === 1L)
    assert(Manifest.read(spark, path).as[(Long, Long)].collect().toMap
      === Map(1L -> 15L, 2L -> 20L))
    // …and the rewritten file physically carries the NEW name only
    val rewritten = Manifest.read(spark, path)
    assert(rewritten.columns.toSeq === Seq("k", "price"))
    // generalized merge over the mixed generations
    val (aff, ins) = Upsert.mergeActions(spark, path,
      Seq((2L, 999L), (7L, 70L)).toDF("k", "price"), Seq("k"),
      Seq(Upsert.MatchedUpdate(None)), Some(None), Seq.empty)
    assert(aff === 1L && ins === 1L)
    assert(Manifest.read(spark, path).as[(Long, Long)].collect().toMap
      === Map(1L -> 15L, 2L -> 999L, 7L -> 70L))
  }

  test("dropColumn narrows the current shape; time travel keeps it; " +
      "tombstones block zombie re-adds and rename-onto") {
    val path = tmp()
    Upsert.upsertParquet(spark, path,
      Seq((1L, 10L, 7L)).toDF("k", "cents", "flag"), Seq("k"))
    val filesBefore = Manifest.currentLive(spark, path).sorted
    val vDrop = Manifest.dropColumn(spark, path, "flag")
    assert(Manifest.currentLive(spark, path).sorted === filesBefore)
    assert(Manifest.read(spark, path).columns.toSeq === Seq("k", "cents"))
    assert(Manifest.readAsOf(spark, path, vDrop - 1).columns
      .contains("flag"))
    // the old file still physically holds `flag` — re-adding the name
    // would resurface stale values as the "new" column's data
    val re = intercept[IllegalArgumentException](
      Manifest.addColumn(spark, path,
        StructField("flag", LongType, nullable = true)))
    assert(re.getMessage.contains("stale values"))
    // renaming another column ONTO a tombstoned name is the same trap
    val rn = intercept[IllegalArgumentException](
      Manifest.renameColumn(spark, path, "cents", "flag"))
    assert(rn.getMessage.contains("stale values"))
    // and a rename's vacated name is tombstoned too
    Manifest.renameColumn(spark, path, "cents", "price")
    val re2 = intercept[IllegalArgumentException](
      Manifest.addColumn(spark, path,
        StructField("cents", LongType, nullable = true)))
    assert(re2.getMessage.contains("stale values"))
  }

  test("rename/drop refuse partition columns and the last column") {
    val path = tmp()
    Upsert.upsertPartitioned(spark, path,
      Seq((1, d1, 10L)).toDF("k", "d", "cents"), Seq("k", "d"), "d")
    val e1 = intercept[IllegalArgumentException](
      Manifest.renameColumn(spark, path, "d", "day"))
    assert(e1.getMessage.contains("partition column"))
    val e2 = intercept[IllegalArgumentException](
      Manifest.dropColumn(spark, path, "d"))
    assert(e2.getMessage.contains("partition column"))
    val p2 = tmp()
    Upsert.upsertParquet(spark, p2, Seq(Tuple1(1L)).toDF("k"), Seq("k"))
    val e3 = intercept[IllegalArgumentException](
      Manifest.dropColumn(spark, p2, "k"))
    assert(e3.getMessage.contains("only column"))
  }

  test("chained renames resolve across three file generations") {
    val path = tmp()
    Upsert.upsertParquet(spark, path,
      Seq((1L, 10L)).toDF("k", "a"), Seq("k"))
    Manifest.renameColumn(spark, path, "a", "b")
    Upsert.upsertParquet(spark, path,
      Seq((2L, 20L)).toDF("k", "b"), Seq("k"))
    Manifest.renameColumn(spark, path, "b", "c")
    Upsert.upsertParquet(spark, path,
      Seq((3L, 30L)).toDF("k", "c"), Seq("k"))
    assert(Manifest.read(spark, path).columns.toSeq === Seq("k", "c"))
    assert(Manifest.read(spark, path).as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // a LATER add/drop migration must not erase the live rename chain
    // (regression: addColumn once evolved the projected DataFrame
    // schema, which strips the prior-name metadata)
    Manifest.addColumn(spark, path, StructField("x", LongType, true))
    Manifest.dropColumn(spark, path, "x")
    assert(Manifest.read(spark, path).select("k", "c")
      .as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 2L -> 20L, 3L -> 30L))
    // every vacated name along the chain is reserved
    Seq("a", "b").foreach { n =>
      val e = intercept[IllegalArgumentException](
        Manifest.addColumn(spark, path,
          StructField(n, LongType, nullable = true)))
      assert(e.getMessage.contains("stale values"), n)
    }
  }

  // ---- round 15: ALTER COLUMN TYPE (lossless widening) --------------

  test("widenColumn is metadata-only: INT32 files read exact under the " +
      "BIGINT pin; time travel keeps the narrow type") {
    val path = tmp()
    Upsert.upsertPartitioned(spark, path,
      Seq((1, d1, 100), (2, d2, 200)).toDF("k", "d", "cents"),
      Seq("k", "d"), "d")
    val filesBefore = Manifest.currentLive(spark, path).sorted
    val vNarrow = Manifest.currentVersion(spark, path).get
    Manifest.widenColumn(spark, path, "cents", LongType)
    assert(Manifest.currentLive(spark, path).sorted === filesBefore)
    val now = Manifest.read(spark, path)
    assert(now.schema("cents").dataType === LongType)
    assert(now.select("k", "cents").as[(Int, Long)].collect().toMap
      === Map(1 -> 100L, 2 -> 200L))
    // pre-widen version keeps INT
    assert(Manifest.readAsOf(spark, path, vNarrow)
      .schema("cents").dataType ===
      org.apache.spark.sql.types.IntegerType)
    // post-widen append lands values beyond Int32; both generations
    // aggregate under one schema
    Upsert.upsertPartitioned(spark, path,
      Seq((9, d2, 5_000_000_000L)).toDF("k", "d", "cents"),
      Seq("k", "d"), "d")
    assert(Manifest.read(spark, path).agg(sum("cents")).as[Long].head()
      === 5_000_000_300L)
  }

  test("widenColumn refuses narrowing, cross-type changes, no-ops, and " +
      "partition columns; decimal widens precision at fixed scale") {
    val path = tmp()
    Upsert.upsertPartitioned(spark, path,
      Seq((1, d1, 100L)).toDF("k", "d", "cents")
        .withColumn("price", col("cents").cast("decimal(10,2)")),
      Seq("k", "d"), "d")
    def refuse(name: String, to: org.apache.spark.sql.types.DataType,
        msg: String): Unit = {
      val e = intercept[IllegalArgumentException](
        Manifest.widenColumn(spark, path, name, to))
      assert(e.getMessage.contains(msg), s"$name→$to: ${e.getMessage}")
    }
    refuse("cents", org.apache.spark.sql.types.IntegerType, "lossless")
    refuse("cents", org.apache.spark.sql.types.StringType, "lossless")
    refuse("cents", LongType, "lossless") // same type: a caller bug
    refuse("price", org.apache.spark.sql.types.DecimalType(12, 4),
      "lossless") // scale change is a rewrite, not a widening
    refuse("d", org.apache.spark.sql.types.TimestampType, "partition")
    refuse("nope", LongType, "no column")
    Manifest.widenColumn(spark, path, "price",
      org.apache.spark.sql.types.DecimalType(20, 2))
    val got = Manifest.read(spark, path).select("price")
    assert(got.schema("price").dataType ===
      org.apache.spark.sql.types.DecimalType(20, 2))
    assert(got.as[java.math.BigDecimal].head()
      === new java.math.BigDecimal("100.00"))
  }

  test("generalized merge over mixed narrow/wide file generations " +
      "rewrites touched files under the widened schema") {
    val path = tmp()
    Upsert.append(spark, path,
      Seq((1L, 10), (2L, 20)).toDF("k", "cents"), None)
    Manifest.widenColumn(spark, path, "cents", LongType)
    Upsert.append(spark, path,
      Seq((3L, 6_000_000_000L)).toDF("k", "cents"), None)
    val (aff, ins) = Upsert.mergeActions(spark, path,
      Seq((2L, 7_000_000_000L), (4L, 40L)).toDF("k", "cents"), Seq("k"),
      Seq(Upsert.MatchedUpdate(None)), Some(None), Seq.empty)
    assert(aff === 1L && ins === 1L)
    assert(Manifest.read(spark, path).as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 2L -> 7_000_000_000L, 3L -> 6_000_000_000L,
        4L -> 40L))
  }

  test("vacuum and rollback retire schema sidecars with their versions") {
    val path = tmp()
    Upsert.upsertParquet(spark, path,
      Seq((1, 10L)).toDF("k", "cents"), Seq("k"))
    val vMig = Manifest.addColumn(spark, path,
      StructField("discount", LongType, nullable = true))
    Manifest.rollback(spark, path, vMig - 1)
    assert(Manifest.schemaAsOf(spark, path, vMig).isEmpty)
    assert(!Manifest.read(spark, path).columns.contains("discount"))
    // re-migrate, then vacuum away the pre-migration version: current
    // still reads evolved
    Manifest.addColumn(spark, path,
      StructField("discount", LongType, nullable = true))
    Manifest.vacuum(spark, path, keep = 1)
    assert(Manifest.read(spark, path).columns.contains("discount"))
  }
}
