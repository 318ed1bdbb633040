package graft

import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Incremental, Manifest, Upsert}

/** Manifest-diff incremental materialized-view maintenance (round 11):
  * changedPartitions names exactly the partitions whose live file set
  * moved, refresh recomputes only those, wholesale overwrite drops
  * vanished groups, the bookmark makes re-refresh a no-op, and the
  * expectedValues guard catches a compute that leaks foreign
  * partitions.
  */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-incr").resolve("t").toString

  private val d1 = Date.valueOf("2024-07-01")
  private val d2 = Date.valueOf("2024-07-02")
  private val d3 = Date.valueOf("2024-07-03")

  private def src(rows: (Int, Date, String, Long)*) =
    rows.toDF("k", "d", "cat", "cents")

  private def mkSource(path: String): Unit =
    Upsert.upsertPartitioned(spark, path, src(
      (1, d1, "a", 100L), (2, d1, "b", 200L),
      (3, d2, "a", 300L), (4, d3, "b", 400L)),
      Seq("k", "d"), "d")

  private def computeMart(df: DataFrame): DataFrame =
    df.groupBy(col("d"), col("cat"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))

  private def martRows(path: String): Set[(Date, String, Long, Long)] =
    Manifest.read(spark, path)
      .select("d", "cat", "n", "sum_cents")
      .as[(Date, String, Long, Long)].collect().toSet

  test("changedPartitions names exactly the touched partitions") {
    val s = tmp()
    mkSource(s)
    val v1 = Manifest.currentVersion(spark, s).get
    Upsert.mergePartitioned(spark, s, src((3, d2, "a", 999L)),
      Seq("k", "d"), "d")
    val v2 = Manifest.currentVersion(spark, s).get
    assert(Incremental.changedPartitions(spark, s, v1, v2) ===
      Seq("d=2024-07-02"))
    assert(Incremental.changedPartitions(spark, s, v1, v1).isEmpty)
  }

  test("full-then-incremental refresh matches a from-scratch recompute") {
    val s = tmp(); val m = tmp()
    mkSource(s)
    val first = Incremental.refresh(spark, s, m, "d")(computeMart)
    assert(first.fromVersion.isEmpty && first.recomputed === Seq("<full>"))
    assert(martRows(m) === Set(
      (d1, "a", 1L, 100L), (d1, "b", 1L, 200L),
      (d2, "a", 1L, 300L), (d3, "b", 1L, 400L)))
    // touch d2 only: reprice + a category flip that must ERASE the
    // (d2, a) mart group — merge-based maintenance would leak it
    Upsert.mergePartitioned(spark, s, src((3, d2, "b", 301L)),
      Seq("k", "d"), "d")
    val second = Incremental.refresh(spark, s, m, "d")(computeMart)
    assert(second.recomputed === Seq("d=2024-07-02"))
    assert(martRows(m) === Set(
      (d1, "a", 1L, 100L), (d1, "b", 1L, 200L),
      (d2, "b", 1L, 301L), (d3, "b", 1L, 400L)))
    // untouched partitions were not rewritten: their live files are
    // bit-identical across the refresh commit
    val live = Manifest.currentLive(spark, m)
    val v = Manifest.currentVersion(spark, m).get
    val prev = Manifest.filesAsOf(spark, m, v - 1)
    assert(live.filter(_.startsWith("d=2024-07-01/")).toSet ===
      prev.filter(_.startsWith("d=2024-07-01/")).toSet)
    assert(live.filter(_.startsWith("d=2024-07-02/")).toSet !==
      prev.filter(_.startsWith("d=2024-07-02/")).toSet)
    // and a third refresh with nothing new is a version no-op
    val third = Incremental.refresh(spark, s, m, "d")(computeMart)
    assert(third.recomputed.isEmpty)
    assert(Manifest.currentVersion(spark, m) === Some(v))
  }

  test("a changed partition whose delta is empty drops the mart slice") {
    val s = tmp(); val m = tmp()
    mkSource(s)
    def onlyA(df: DataFrame): DataFrame = computeMart(df.filter(col("cat") === "a"))
    Incremental.refresh(spark, s, m, "d")(onlyA)
    assert(martRows(m).map(_._1) === Set(d1, d2))
    // d2's only 'a' row flips to 'b' -> the d2 mart slice must VANISH
    Upsert.mergePartitioned(spark, s, src((3, d2, "b", 300L)),
      Seq("k", "d"), "d")
    Incremental.refresh(spark, s, m, "d")(onlyA)
    assert(martRows(m) === Set((d1, "a", 1L, 100L)))
  }

  test("overwritePartitions guards against computes leaking partitions") {
    val m = tmp()
    Upsert.overwritePartitions(spark, m,
      Seq((d1, "a", 1L, 1L), (d2, "a", 1L, 2L))
        .toDF("d", "cat", "n", "sum_cents"), "d")
    val e = intercept[IllegalArgumentException] {
      Upsert.overwritePartitions(spark, m,
        Seq((d3, "a", 1L, 9L)).toDF("d", "cat", "n", "sum_cents"), "d",
        expectedValues = Some(Seq("2024-07-02")))
    }
    assert(e.getMessage.contains("2024-07-03"))
    // the failed overwrite must not have become visible
    assert(martRows(m).map(_._1) === Set(d1, d2))
  }

  test("unpartitioned data slipping into the source fails the refresh loudly") {
    val s = tmp(); val m = tmp()
    mkSource(s)
    Incremental.refresh(spark, s, m, "d")(computeMart)
    // a FLAT write into the partitioned source: the new files live at
    // the table root, so no 'd=' partition moves and a silent refresh
    // would advance the bookmark past real changes
    Upsert.upsertParquet(spark, s, src((9, d1, "a", 900L)), Seq("k", "d"))
    val e = intercept[IllegalArgumentException] {
      Incremental.refresh(spark, s, m, "d")(computeMart)
    }
    assert(e.getMessage.contains("unpartitioned"))
    // the bookmark did NOT advance: fixing the source re-enables refresh
    assert(Incremental.appliedSourceVersion(spark, m).isDefined)
  }

  test("refresh requires a manifest-managed source") {
    val bare = tmp()
    Seq((1, d1, "a", 1L)).toDF("k", "d", "cat", "cents")
      .write.partitionBy("d").parquet(bare)
    intercept[IllegalStateException] {
      Incremental.refresh(spark, bare, tmp(), "d")(computeMart)
    }
  }
}
