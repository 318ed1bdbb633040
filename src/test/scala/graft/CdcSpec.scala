package graft

import java.nio.file.Files
import java.sql.Date
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{ChangeFeed, Manifest, Upsert}

/** Row-level CDC from manifest file diffs (round 11,
  * [[graft.engine.ChangeFeed]]): classification of all three change
  * types with both update images, the value-identical-rewrite filter,
  * the O(changed-files) scan guarantee, net semantics over a version
  * range, and the empty range. The end-to-end arithmetic is
  * q_cdc_feed's oracle half.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-cdc").resolve("t").toString

  private val d1 = Date.valueOf("2024-07-01")
  private val d2 = Date.valueOf("2024-07-02")

  private def rows(rs: (Int, Date, Long)*) = rs.toDF("k", "d", "cents")

  private def feed(path: String, vFrom: Long, vTo: Long) =
    ChangeFeed.changes(spark, path, vFrom, vTo, Seq("k"))
      .select("k", "d", "cents", ChangeFeed.ChangeCol)
      .as[(Int, Date, Long, String)].collect().toSet

  test("insert, delete, both update images, and the identical-rewrite filter") {
    val p = tmp()
    Upsert.upsertPartitioned(spark, p,
      rows((1, d1, 100L), (2, d1, 200L), (3, d1, 300L), (4, d2, 400L)),
      Seq("k", "d"), "d")
    val v1 = Manifest.currentVersion(spark, p).get
    // one overwrite of d1: k=3 vanishes, k=2 repriced, k=5 appears,
    // k=1 rewritten with IDENTICAL values; d2 (k=4) untouched
    Upsert.overwritePartitions(spark, p,
      rows((1, d1, 100L), (2, d1, 201L), (5, d1, 500L)), "d")
    val v2 = Manifest.currentVersion(spark, p).get
    assert(feed(p, v1, v2) === Set(
      (2, d1, 200L, "update_preimage"),
      (2, d1, 201L, "update_postimage"),
      (3, d1, 300L, "delete"),
      (5, d1, 500L, "insert")))
  }

  test("the feed reads only files changed in the range") {
    val p = tmp()
    Upsert.upsertPartitioned(spark, p,
      rows((1, d1, 100L), (2, d2, 200L)), Seq("k", "d"), "d")
    val v1 = Manifest.currentVersion(spark, p).get
    Upsert.overwritePartitions(spark, p, rows((2, d2, 999L)), "d")
    val v2 = Manifest.currentVersion(spark, p).get
    val scanned = ChangeFeed.changes(spark, p, v1, v2, Seq("k")).inputFiles
    assert(scanned.nonEmpty)
    assert(scanned.forall(_.contains("/d=2024-07-02/")),
      s"feed scanned files outside the changed partition: " +
        scanned.mkString(", "))
  }

  test("net semantics: a row inserted then deleted inside the range is silent") {
    val p = tmp()
    Upsert.upsertPartitioned(spark, p, rows((1, d1, 100L)),
      Seq("k", "d"), "d")
    val v1 = Manifest.currentVersion(spark, p).get
    Upsert.overwritePartitions(spark, p, rows((1, d1, 100L), (9, d1, 900L)), "d")
    Upsert.overwritePartitions(spark, p, rows((1, d1, 100L)), "d")
    val v3 = Manifest.currentVersion(spark, p).get
    // k=9 lived only between the endpoints; k=1's rewrites are
    // value-identical — the net feed over (v1, v3] is EMPTY even
    // though every file in the partition was replaced twice
    assert(feed(p, v1, v3) === Set.empty)
  }

  test("a same-version range is an empty, correctly-typed feed") {
    val p = tmp()
    Upsert.upsertPartitioned(spark, p, rows((1, d1, 100L)),
      Seq("k", "d"), "d")
    val v = Manifest.currentVersion(spark, p).get
    val df = ChangeFeed.changes(spark, p, v, v, Seq("k"))
    assert(df.columns.contains(ChangeFeed.ChangeCol))
    assert(df.count() === 0)
  }

  test("a column added mid-range backfills NULL on the old side") {
    val p = tmp()
    Upsert.upsertPartitioned(spark, p, rows((1, d1, 100L), (2, d1, 200L)),
      Seq("k", "d"), "d")
    val v1 = Manifest.currentVersion(spark, p).get
    // schema evolution, then a rewrite that fills the new column for k=1
    Manifest.addColumn(spark, p, org.apache.spark.sql.types.StructField(
      "tag", org.apache.spark.sql.types.StringType, nullable = true))
    Upsert.overwritePartitions(spark, p,
      Seq((1, d1, 100L, "hot"), (2, d1, 200L, null: String))
        .toDF("k", "d", "cents", "tag"), "d")
    val v3 = Manifest.currentVersion(spark, p).get
    val feed = ChangeFeed.changes(spark, p, v1, v3, Seq("k"))
      .select("k", "cents", "tag", ChangeFeed.ChangeCol)
      .as[(Int, Long, Option[String], String)].collect().toSet
    // k=1: NULL -> 'hot' is an update with both images under the
    // evolved schema; k=2: NULL -> NULL is value-identical — silent
    assert(feed === Set(
      (1, 100L, None, "update_preimage"),
      (1, 100L, Some("hot"), "update_postimage")))
  }

  test("a pure append is all inserts") {
    val p = tmp()
    Upsert.upsertPartitioned(spark, p, rows((1, d1, 100L)),
      Seq("k", "d"), "d")
    val v1 = Manifest.currentVersion(spark, p).get
    Upsert.upsertPartitioned(spark, p, rows((2, d2, 200L)),
      Seq("k", "d"), "d")
    val v2 = Manifest.currentVersion(spark, p).get
    assert(feed(p, v1, v2) === Set((2, d2, 200L, "insert")))
  }
}
