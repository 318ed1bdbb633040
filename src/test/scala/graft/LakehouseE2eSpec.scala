package graft

import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine._

/** The round-11 lakehouse layer as ONE story — two "days" of a
  * warehouse's life driven end-to-end through the real components, each
  * handing its output to the next: exactly-once streaming append →
  * manifest-diff incremental mart refresh → MV-rewritten analyst query
  * → atomic publication → CDC feed → exactly-once JDBC replica →
  * row-level delete → pin-protecting vacuum. Every seam asserted is a
  * seam a production pipeline crosses daily; the point of the spec is
  * that the pieces COMPOSE, not just pass their own unit tests.
  */
class LakehouseE2eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d1 = Date.valueOf("2024-07-01")
  private val d2 = Date.valueOf("2024-07-02")
  private val url = "jdbc:derby:memory:graft_lakehouse_e2e;create=true"

  private def martOf(df: DataFrame): DataFrame =
    df.groupBy(col("d")).agg(
      count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))

  test("two days in the life of the lakehouse") {
    val wh = Files.createTempDirectory("graft-e2e").toString
    val src = s"$wh/events"; val mart = s"$wh/daily"

    // ── day 1: land two batches exactly-once (replay one of them) ──
    assert(Upsert.appendEpoch(spark, src,
      Seq((1, d1, 100L), (2, d1, 200L)).toDF("k", "d", "cents"),
      Some("d"), "ingest", 0L))
    assert(Upsert.appendEpoch(spark, src,
      Seq((3, d1, 300L)).toDF("k", "d", "cents"), Some("d"), "ingest", 1L))
    assert(!Upsert.appendEpoch(spark, src,
      Seq((3, d1, 300L)).toDF("k", "d", "cents"), Some("d"), "ingest", 1L),
      "replayed batch must be a detected no-op")

    // refresh the mart incrementally, register the MV, publish the pair
    Incremental.refresh(spark, src, mart, "d")(martOf)
    MaterializedViews.register(spark, "e2e_daily", src, mart)(martOf)
    val pub1 = Publication.publish(spark, wh, Seq("events", "daily"))

    // the analyst's source-authored query is answered from the mart
    val day1 = martOf(Manifest.read(spark, src))
    assert(day1.inputFiles.forall(_.contains(mart)))
    assert(day1.select("d", "n", "sum_cents").as[(Date, Long, Long)]
      .collect().toSet === Set((d1, 3L, 600L)))

    // the replica subscribes and converges
    assert(CdcSync.syncReplica(spark, src, Seq("k"), url, "r_events").applied)

    // ── day 2: a late correction + new day, then a GDPR delete ──
    val v1 = Manifest.currentVersion(spark, src).get
    Upsert.mergePartitioned(spark, src,
      Seq((2, d1, 201L), (4, d2, 400L)).toDF("k", "d", "cents"),
      Seq("k", "d"), "d")
    Upsert.deleteWhere(spark, src, col("k") === 1)
    val v3 = Manifest.currentVersion(spark, src).get

    // the MV is STALE now: the same query pays the honest source scan
    val stale = martOf(Manifest.read(spark, src))
    assert(stale.inputFiles.forall(_.contains(src)))
    // the change feed names exactly the day's mutations, net
    assert(ChangeFeed.changes(spark, src, v1, v3, Seq("k"))
      .select("k", ChangeFeed.ChangeCol).as[(Int, String)]
      .collect().toSet === Set((1, "delete"), (2, "update_preimage"),
        (2, "update_postimage"), (4, "insert")))
    // refresh re-arms the MV; only the touched day recomputed
    val r = Incremental.refresh(spark, src, mart, "d")(martOf)
    assert(r.recomputed.toSet === Set("d=2024-07-01", "d=2024-07-02"))
    val day2 = martOf(Manifest.read(spark, src))
    assert(day2.inputFiles.forall(_.contains(mart)))
    assert(day2.select("d", "n", "sum_cents").as[(Date, Long, Long)]
      .collect().toSet === Set((d1, 2L, 501L), (d2, 1L, 400L)))

    // publish day 2; the day-1 publication still reads coherently
    val pub2 = Publication.publish(spark, wh, Seq("events", "daily"))
    val pins1 = Publication.resolveAsOf(spark, wh, pub1)
    assert(Manifest.readAsOf(spark, src, pins1("events"))
      .count() === 3L, "day-1 snapshot must still read whole")

    // the replica catches up across the merge AND the delete
    assert(CdcSync.syncReplica(spark, src, Seq("k"), url, "r_events").applied)
    val replica = spark.read.jdbc(url, "r_events", new java.util.Properties())
      .select("k", "cents").as[(Int, Long)].collect().toSet
    assert(replica === Set((2, 201L), (3, 300L), (4, 400L)))

    // vacuum with pins: day-1 stays readable while both pubs retained,
    // then retiring pub1 releases its history
    Publication.vacuumWarehouse(spark, wh, keepPubs = 2, keepTables = 1)
    assert(Manifest.readAsOf(spark, src, pins1("events")).count() === 3L)
    Publication.vacuumWarehouse(spark, wh, keepPubs = 1, keepTables = 1)
    assert(!Manifest.versions(spark, src).contains(pins1("events")))
    assert(Publication.currentVersion(spark, wh) === Some(pub2))

    MaterializedViews.deregister(spark, "e2e_daily")
  }
}
