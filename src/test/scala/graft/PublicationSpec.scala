package graft

import java.nio.file.Files
import java.sql.Date
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Manifest, Publication, Upsert}

/** Cross-table snapshot isolation ([[graft.engine.Publication]]): a
  * reader resolving the publication sees an all-old or all-new STAR,
  * never a mixed one — even at the exact point where per-table
  * manifest reads would mix (fact committed, mart not yet). Plus
  * cross-table time travel and the loud-error paths.
  */
class PublicationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-pub").resolve("wh").toString

  private val d1 = Date.valueOf("2024-07-01")

  // a two-table "star": fact rows and a mart that must equal the
  // fact's per-date sum — the invariant a mixed read breaks
  private def writeFact(wh: String, cents: Long): Unit =
    Upsert.overwritePartitions(spark, s"$wh/fact",
      Seq((1, d1, cents), (2, d1, cents)).toDF("k", "d", "cents"), "d")

  private def writeMart(wh: String): Unit =
    Upsert.overwritePartitions(spark, s"$wh/mart",
      Manifest.read(spark, s"$wh/fact")
        .groupBy("d").agg(org.apache.spark.sql.functions.sum("cents")
          .as("sum_cents")), "d")

  private def factSum(df: org.apache.spark.sql.DataFrame): Long =
    df.agg(org.apache.spark.sql.functions.sum("cents")).as[Long].head()

  private def martSum(df: org.apache.spark.sql.DataFrame): Long =
    df.agg(org.apache.spark.sql.functions.sum("sum_cents")).as[Long].head()

  test("a publication-resolved reader never sees a mixed star") {
    val wh = tmp()
    writeFact(wh, 100L); writeMart(wh)
    Publication.publish(spark, wh, Seq("fact", "mart"))
    // the invariant holds at publication 1
    assert(factSum(Publication.readTable(spark, wh, "fact")) ===
      martSum(Publication.readTable(spark, wh, "mart")))
    // MID-LOAD: the new fact is committed, the new mart is NOT —
    // latest-version reads now mix (the gap Postgres never shows)
    writeFact(wh, 250L)
    assert(factSum(Manifest.read(spark, s"$wh/fact")) === 500L)
    assert(martSum(Manifest.read(spark, s"$wh/mart")) === 200L) // mixed!
    // ...but the publication still pins the coherent old pair
    assert(factSum(Publication.readTable(spark, wh, "fact")) === 200L)
    assert(martSum(Publication.readTable(spark, wh, "mart")) === 200L)
    // load completes and publishes: readers atomically flip to all-new
    writeMart(wh)
    Publication.publish(spark, wh, Seq("fact", "mart"))
    assert(factSum(Publication.readTable(spark, wh, "fact")) === 500L)
    assert(martSum(Publication.readTable(spark, wh, "mart")) === 500L)
  }

  test("a resolved snapshot cannot straddle a publish; bare readTable can") {
    val wh = tmp()
    writeFact(wh, 100L); writeMart(wh)
    Publication.publish(spark, wh, Seq("fact", "mart"))
    // resolve ONCE, then a full new load + publish lands in between
    val snap = Publication.snapshot(spark, wh)
    val factOld = factSum(snap.readTable(spark, "fact"))
    writeFact(wh, 250L); writeMart(wh)
    Publication.publish(spark, wh, Seq("fact", "mart"))
    // the snapshot handle still serves the OLD coherent pair
    assert(factOld === 200L)
    assert(martSum(snap.readTable(spark, "mart")) === 200L)
    assert(factSum(snap.readTable(spark, "fact")) === 200L)
    // bare readTable re-resolves per call: across the publish it serves
    // the NEW pair — which is why multi-table queries must use snapshot
    assert(factSum(Publication.readTable(spark, wh, "fact")) === 500L)
  }

  test("old publications stay resolvable: cross-table time travel") {
    val wh = tmp()
    writeFact(wh, 100L); writeMart(wh)
    val p1 = Publication.publish(spark, wh, Seq("fact", "mart"))
    writeFact(wh, 300L); writeMart(wh)
    Publication.publish(spark, wh, Seq("fact", "mart"))
    val pins1 = Publication.resolveAsOf(spark, wh, p1)
    val oldFact = Manifest.readAsOf(spark, s"$wh/fact", pins1("fact"))
    val oldMart = Manifest.readAsOf(spark, s"$wh/mart", pins1("mart"))
    assert(factSum(oldFact) === 200L && martSum(oldMart) === 200L)
  }

  test("publishing an unmanaged table and reading an unpublished one fail loudly") {
    val wh = tmp()
    writeFact(wh, 100L)
    intercept[IllegalStateException] {
      Publication.publish(spark, wh, Seq("fact", "nope"))
    }
    Publication.publish(spark, wh, Seq("fact"))
    intercept[IllegalArgumentException] {
      Publication.readTable(spark, wh, "mart")
    }
    val empty = tmp()
    intercept[IllegalStateException] {
      Publication.readTable(spark, empty, "fact")
    }
  }

  test("vacuumWarehouse retires history without dangling a retained publication") {
    val wh = tmp()
    writeFact(wh, 100L); writeMart(wh)
    val p1 = Publication.publish(spark, wh, Seq("fact", "mart"))
    // churn: three more fact versions, only the last published
    writeFact(wh, 200L); writeFact(wh, 300L); writeFact(wh, 400L)
    writeMart(wh)
    val p2 = Publication.publish(spark, wh, Seq("fact", "mart"))
    // keep both pubs, keep only 1 version per table by count: p1's
    // pinned fact version (v1) is far outside the keep-count yet MUST
    // survive via protect; the unpinned v2/v3 must be gone
    val (pubsDropped, _) =
      Publication.vacuumWarehouse(spark, wh, keepPubs = 2, keepTables = 1)
    assert(pubsDropped === 0)
    val pins1 = Publication.resolveAsOf(spark, wh, p1)
    assert(factSum(Manifest.readAsOf(spark, s"$wh/fact", pins1("fact"))) === 200L)
    assert(martSum(Manifest.readAsOf(spark, s"$wh/mart", pins1("mart"))) === 200L)
    val survivors = Manifest.versions(spark, s"$wh/fact").toSet
    assert(survivors.contains(pins1("fact")))
    assert(!survivors.contains(pins1("fact") + 1) &&
      !survivors.contains(pins1("fact") + 2),
      s"unpinned intermediate fact versions survived: $survivors")
    // retiring p1 releases its pins: the next vacuum reclaims them
    val (dropped2, _) =
      Publication.vacuumWarehouse(spark, wh, keepPubs = 1, keepTables = 1)
    assert(dropped2 === 1)
    assert(!Manifest.versions(spark, s"$wh/fact").contains(pins1("fact")))
    // the retained publication still reads coherently
    assert(factSum(Publication.readTable(spark, wh, "fact")) === 800L)
    assert(martSum(Publication.readTable(spark, wh, "mart")) === 800L)
    assert(Publication.currentVersion(spark, wh) === Some(p2))
  }

  test("the daily pipeline publishes a consistent star every run") {
    val wh = tmp()
    val landing = Files.createTempDirectory("graft-pub-landing").toString
    val fixtures = "fixtures/lastfm_raw"
    val dates = new java.io.File(fixtures).listFiles().map(_.getName).sorted
    assert(dates.nonEmpty, s"fixture dir $fixtures is empty")
    val day = dates.head
    val src = java.nio.file.Paths.get(fixtures, day)
    val dst = java.nio.file.Paths.get(landing, day)
    java.nio.file.Files.createDirectories(dst)
    java.nio.file.Files.list(src).forEach { f =>
      java.nio.file.Files.copy(f, dst.resolve(f.getFileName.getFileName)); ()
    }
    Pipeline.runDaily(spark, landing, wh, day)
    val pins = Publication.resolve(spark, wh).get
    assert(pins.keySet === Set("ods_daily_data", "dds_dim_artist",
      "dds_dim_country", "dds_dim_song", "dds_fact_daily_top_100",
      "dm_avg_song_duration_by_country", "dm_artist_appearances_by_date",
      "dm_expected_artist_royalties_by_date"))
    // the published fact is readable and non-empty via the publication
    assert(Publication.readTable(spark, wh, "dds_fact_daily_top_100")
      .count() > 0)
  }
}
