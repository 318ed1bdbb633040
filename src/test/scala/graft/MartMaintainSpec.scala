package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Incremental, Manifest, Upsert}
import graft.streaming.GraftStreaming

/** The streaming CDC-to-mart maintenance loop
  * ([[GraftStreaming.martMaintainStream]]): a manifest-tailing stream
  * that refreshes a derived mart's touched partitions and publishes the
  * mart's net changes to a JDBC replica — each leg exactly-once against
  * its OWN transactional offset, so a lost checkpoint replays to zero
  * duplicates.
  */
class MartMaintainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_maintain_spec;create=true"

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("t").toString

  private val d1 = Date.valueOf("2024-07-01")
  private val d2 = Date.valueOf("2024-07-02")
  private val d3 = Date.valueOf("2024-07-03")

  /** mart = per-(d, bucket) exact cent sums — per-partition decomposable. */
  private def martOf(src: DataFrame): DataFrame =
    src.groupBy(col("d"), (col("k") % 2).as("bucket"))
      .agg(sum("cents").as("cents"))

  private def runLoop(src: String, mart: String, ckpt: String,
      table: Option[String]): Unit = {
    val q = GraftStreaming.martMaintainStream(spark, src, mart, "d",
      Seq("d", "bucket"), ckpt,
      publishTo = table.map(t => (url, t)))(martOf)
    q.awaitTermination(120000); ()
  }

  private def fullRecompute(src: String): Set[(Date, Long, Long)] =
    martOf(Manifest.read(spark, src))
      .as[(Date, Long, Long)].collect().toSet

  private def martRows(mart: String): Set[(Date, Long, Long)] =
    Manifest.read(spark, mart).select("d", "bucket", "cents")
      .as[(Date, Long, Long)].collect().toSet

  private def replicaRows(table: String): Set[(Date, Long, Long)] =
    spark.read.jdbc(url, table, new java.util.Properties())
      .select("d", "bucket", "cents")
      .as[(Date, Long, Long)].collect().toSet

  test("mart and replica track the source across commits; refresh is " +
      "partition-scoped") {
    val src = tmp("graft-mm-src"); val mart = tmp("graft-mm-mart")
    val ckpt = tmp("graft-mm-ckpt"); val tbl = "mm_track"
    Upsert.upsertPartitioned(spark, src,
      (1 to 20).map(i => (i, if (i <= 10) d1 else d2, i * 100L))
        .toDF("k", "d", "cents"), Seq("k", "d"), "d")
    runLoop(src, mart, ckpt, Some(tbl))
    assert(martRows(mart) === fullRecompute(src))
    assert(replicaRows(tbl) === fullRecompute(src))

    // second source commit touches ONLY d3; the refresh must be scoped
    Upsert.append(spark, src,
      Seq((21, d3, 2100L), (22, d3, 2200L)).toDF("k", "d", "cents"),
      Some("d"))
    val before = Incremental.appliedSourceVersion(spark, mart).get
    runLoop(src, mart, ckpt, Some(tbl))
    assert(Incremental.appliedSourceVersion(spark, mart).get > before)
    assert(martRows(mart) === fullRecompute(src))
    assert(replicaRows(tbl) === fullRecompute(src))
    // the d1/d2 mart files were NOT rewritten by the second pass
    val vs = Manifest.versions(spark, mart)
    val untouched = Manifest.filesAsOf(spark, mart, vs.init.last)
      .filterNot(_.startsWith("d=2024-07-03/")).toSet
    assert(Manifest.filesAsOf(spark, mart, vs.last)
      .filterNot(_.startsWith("d=2024-07-03/")).toSet === untouched)
  }

  test("checkpoint loss replays every trigger to ZERO duplicates") {
    val src = tmp("graft-mm2-src"); val mart = tmp("graft-mm2-mart")
    val ckpt = tmp("graft-mm2-ckpt"); val tbl = "mm_replay"
    Upsert.upsertPartitioned(spark, src,
      (1 to 10).map(i => (i, d1, i * 10L)).toDF("k", "d", "cents"),
      Seq("k", "d"), "d")
    Upsert.append(spark, src, Seq((11, d2, 990L)).toDF("k", "d", "cents"),
      Some("d"))
    runLoop(src, mart, ckpt, Some(tbl))
    val expected = fullRecompute(src)
    assert(martRows(mart) === expected)
    assert(replicaRows(tbl) === expected)
    val martV = Manifest.currentVersion(spark, mart).get

    // lose the checkpoint: the stream re-reads EVERY manifest version
    // and replays every trigger — the mart bookmark and the replica's
    // transactional offset must make all of it a no-op
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    runLoop(src, mart, tmp("graft-mm2-ckpt2"), Some(tbl))
    assert(martRows(mart) === expected)
    assert(replicaRows(tbl) === expected)
    // row-level: exact count, not just set equality (duplicates would
    // collapse in a set)
    assert(spark.read.jdbc(url, tbl, new java.util.Properties()).count()
      === expected.size.toLong)
    assert(Manifest.read(spark, mart).count() === expected.size.toLong)
    // and the replayed loop committed NO new mart version
    assert(Manifest.currentVersion(spark, mart).get === martV)
  }

  test("a lost replica publish is healed by the next trigger (offset " +
      "lags the mart, sync catches up)") {
    val src = tmp("graft-mm3-src"); val mart = tmp("graft-mm3-mart")
    val tbl = "mm_heal"
    Upsert.upsertPartitioned(spark, src,
      Seq((1, d1, 100L), (2, d2, 200L)).toDF("k", "d", "cents"),
      Seq("k", "d"), "d")
    // crash shape: refresh landed, publish never ran (no publishTo)
    runLoop(src, mart, tmp("graft-mm3-ckpt1"), None)
    assert(martRows(mart) === fullRecompute(src))
    // next maintenance run (fresh checkpoint — even the degenerate
    // replay case) publishes the backlog: seeds the replica in full
    runLoop(src, mart, tmp("graft-mm3-ckpt2"), Some(tbl))
    assert(replicaRows(tbl) === fullRecompute(src))
  }
}
