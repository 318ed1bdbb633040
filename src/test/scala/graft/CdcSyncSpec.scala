package graft

import java.nio.file.Files
import java.sql.Date
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{CdcSync, ChangeFeed, JdbcSink, Manifest, Upsert}

/** Exactly-once CDC replica maintenance ([[graft.engine.CdcSync]] +
  * [[graft.engine.JdbcSink.applyChanges]]) against in-process Derby:
  * the replica converges to each source snapshot exactly, the
  * transactional offset makes replays no-ops and stale feeds loud
  * errors, and the first sync seeds from the full snapshot.
  */
class CdcSyncSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_cdcsync_spec;create=true"

  private def tmp(): String =
    Files.createTempDirectory("graft-cdcsync").resolve("t").toString

  private val d1 = Date.valueOf("2024-07-01")
  private val d2 = Date.valueOf("2024-07-02")

  private def rows(rs: (Int, Date, Long)*) = rs.toDF("k", "d", "cents")

  private def replica(table: String): Set[(Int, Date, Long)] =
    spark.read.jdbc(url, table, new java.util.Properties())
      .select("k", "d", "cents")
      .as[(Int, Date, Long)].collect().toSet

  private def snapshot(path: String): Set[(Int, Date, Long)] =
    Manifest.read(spark, path).select("k", "d", "cents")
      .as[(Int, Date, Long)].collect().toSet

  test("replica converges to every source snapshot through net syncs") {
    val p = tmp(); val tbl = "r_conv"
    Upsert.upsertPartitioned(spark, p,
      rows((1, d1, 100L), (2, d1, 200L), (3, d2, 300L)),
      Seq("k", "d"), "d")
    val s1 = CdcSync.syncReplica(spark, p, Seq("k"), url, tbl)
    assert(s1.fromVersion.isEmpty && s1.applied)
    assert(replica(tbl) === snapshot(p))
    // delete k=2, update k=1, insert k=4 — all in one overwrite of d1
    Upsert.overwritePartitions(spark, p,
      rows((1, d1, 101L), (4, d1, 400L)), "d")
    val s2 = CdcSync.syncReplica(spark, p, Seq("k"), url, tbl)
    assert(s2.applied && s2.fromVersion === Some(s1.toVersion))
    assert(replica(tbl) === snapshot(p))
    assert(replica(tbl) ===
      Set((1, d1, 101L), (4, d1, 400L), (3, d2, 300L)))
    // two source commits between syncs: the single net sync still lands
    Upsert.upsertPartitioned(spark, p, rows((5, d2, 500L)),
      Seq("k", "d"), "d")
    Upsert.overwritePartitions(spark, p, rows((5, d2, 501L), (3, d2, 300L)), "d")
    assert(CdcSync.syncReplica(spark, p, Seq("k"), url, tbl).applied)
    assert(replica(tbl) === snapshot(p))
  }

  test("a replayed range is a no-op and the replica is untouched") {
    val p = tmp(); val tbl = "r_replay"
    Upsert.upsertPartitioned(spark, p, rows((1, d1, 100L)),
      Seq("k", "d"), "d")
    assert(CdcSync.syncReplica(spark, p, Seq("k"), url, tbl).applied)
    // no new source version: sync is a detected no-op before any JDBC write
    val again = CdcSync.syncReplica(spark, p, Seq("k"), url, tbl)
    assert(!again.applied)
    // crash-replay shape: applyChanges re-invoked for an ALREADY-applied
    // range (offset moved past it) returns false and changes nothing
    val v1 = Manifest.currentVersion(spark, p).get
    Upsert.overwritePartitions(spark, p, rows((1, d1, 999L)), "d")
    val v2 = Manifest.currentVersion(spark, p).get
    assert(CdcSync.syncReplica(spark, p, Seq("k"), url, tbl).applied)
    val feed = ChangeFeed.changes(spark, p, v1, v2, Seq("k"))
    assert(!JdbcSink.applyChanges(feed, url, tbl, Seq("k"), Some(v1), v2))
    assert(replica(tbl) === Set((1, d1, 999L)))
  }

  test("a feed computed from a stale offset is rejected loudly") {
    val p = tmp(); val tbl = "r_stale"
    Upsert.upsertPartitioned(spark, p, rows((1, d1, 100L)),
      Seq("k", "d"), "d")
    val v1 = Manifest.currentVersion(spark, p).get
    assert(CdcSync.syncReplica(spark, p, Seq("k"), url, tbl).applied)
    Upsert.overwritePartitions(spark, p, rows((1, d1, 101L)), "d")
    val v2 = Manifest.currentVersion(spark, p).get
    Upsert.overwritePartitions(spark, p, rows((1, d1, 102L)), "d")
    val v3 = Manifest.currentVersion(spark, p).get
    // replica is at v1; applying (v2, v3] would skip the v1→v2 delta
    val e = intercept[IllegalStateException] {
      JdbcSink.applyChanges(
        ChangeFeed.changes(spark, p, v2, v3, Seq("k")),
        url, tbl, Seq("k"), Some(v2), v3)
    }
    assert(e.getMessage.contains("recompute"))
    assert(replica(tbl) === Set((1, d1, 100L)))
    // the correct resume from the replica's own offset still works
    assert(CdcSync.syncReplica(spark, p, Seq("k"), url, tbl).applied)
    assert(replica(tbl) === Set((1, d1, 102L)))
  }
}
