package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cross-day product contract: incremental daily runs with stable
  * dim ids, append-only fact, idempotent replays, and mart parity with a
  * full rebuild.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val landing = graft.ingest.OdsBuilder.fixtureRoot
  private lazy val wh = Files.createTempDirectory("graft-wh").toString

  test("two daily runs build the warehouse incrementally with stable dim ids") {
    Pipeline.runDaily(spark, landing, wh, "2024-05-01")
    assert(graft.engine.Manifest.read(spark, Pipeline.odsPath(wh)).count() === 33)
    assert(graft.engine.Manifest.read(spark, Pipeline.factPath(wh)).count() === 33)
    val songsDay1 = graft.engine.Manifest.read(spark, Pipeline.dimSongPath(wh))
      .as[(Long, String, Long)].collect().toSet
    val artistsDay1 = graft.engine.Manifest.read(spark, Pipeline.dimArtistPath(wh))
      .as[(Long, String)].collect().toSet

    Pipeline.runDaily(spark, landing, wh, "2024-05-02")
    assert(graft.engine.Manifest.read(spark, Pipeline.odsPath(wh)).count() === 66)
    assert(graft.engine.Manifest.read(spark, Pipeline.factPath(wh)).count() === 66)

    // serial semantics: every day-1 id survives day 2 unchanged
    val songsDay2 = graft.engine.Manifest.read(spark, Pipeline.dimSongPath(wh))
      .as[(Long, String, Long)].collect().toSet
    assert(songsDay1.subsetOf(songsDay2))
    assert(songsDay2.size > songsDay1.size, "day 2 should add new song keys")
    val artistsDay2 = graft.engine.Manifest.read(spark, Pipeline.dimArtistPath(wh))
      .as[(Long, String)].collect().toSet
    assert(artistsDay2 === artistsDay1, "no new artists on day 2")

    // ids are dense and unique
    val ids = songsDay2.map(_._1)
    assert(ids === (1L to ids.size).toSet)
  }

  test("replaying a day is a no-op for every table") {
    val before = Seq(Pipeline.odsPath(wh), Pipeline.factPath(wh),
      Pipeline.dimSongPath(wh), Pipeline.martRoyaltiesPath(wh))
      .map(p => p -> graft.engine.Manifest.read(spark, p).count()).toMap
    Pipeline.runDaily(spark, landing, wh, "2024-05-02")
    before.foreach { case (p, n) =>
      assert(graft.engine.Manifest.read(spark, p).count() === n, s"replay changed $p")
    }
  }

  test("incremental royalties mart equals the full single-pass rebuild") {
    val incremental = graft.engine.Manifest.read(spark, Pipeline.martRoyaltiesPath(wh))
      .select(col("date").cast("string"), col("artist_name"), col("royalties"))
      .as[(String, String, Double)].collect().toSet
    val fullRebuild = graft.queries.IngestQueries.e2eRoyaltiesQuery.run(spark, "")
      .select(col("date").cast("string"), col("artist_name"), col("royalties"))
      .as[(String, String, Double)].collect().toSet
    assert(incremental === fullRebuild)
  }

  test("backfill runs exactly the missing dates, oldest first, and is then a no-op") {
    val wh2 = Files.createTempDirectory("graft-wh-backfill").toString
    // seed only the SECOND date; backfill must then pick up the first
    Pipeline.runDaily(spark, landing, wh2, "2024-05-02")
    val ran = Pipeline.backfill(spark, landing, wh2)
    assert(ran === Seq("2024-05-01"))
    assert(graft.engine.Manifest.read(spark, Pipeline.odsPath(wh2)).count() === 66)
    // warehouse now matches the in-order build (same marts, same rows)
    val royalties = graft.engine.Manifest.read(spark, Pipeline.martRoyaltiesPath(wh2)).count()
    assert(royalties === graft.engine.Manifest.read(spark, Pipeline.martRoyaltiesPath(wh)).count())
    // fully caught up -> nothing to do
    assert(Pipeline.backfill(spark, landing, wh2) === Seq.empty)
  }

  test("backfill repairs a day that crashed after ODS but before the marts") {
    val wh3 = Files.createTempDirectory("graft-wh-repair").toString
    Pipeline.runDaily(spark, landing, wh3, "2024-05-01")
    Pipeline.runDaily(spark, landing, wh3, "2024-05-02")
    // simulate a crash mid-run: day 2's mart commits never happened —
    // roll each mart's manifest back one version, leaving day-2's data
    // files behind as the orphans a real pre-commit crash leaves
    Seq(Pipeline.martRoyaltiesPath(wh3), Pipeline.martAvgPath(wh3),
      Pipeline.martAppearancesPath(wh3)).foreach { m =>
      graft.engine.Manifest.rollback(spark, m,
        graft.engine.Manifest.currentVersion(spark, m).get - 1)
    }
    // done-marker is the LAST-written table, so the day is re-run
    assert(Pipeline.backfill(spark, landing, wh3) === Seq("2024-05-02"))
    assert(graft.engine.Manifest.read(spark, Pipeline.martRoyaltiesPath(wh3))
      .filter(col("date") === "2024-05-02").count() > 0)
    // ODS replay inside the repair appended nothing new
    assert(graft.engine.Manifest.read(spark, Pipeline.odsPath(wh3)).count() === 66)
  }

  test("backfill's automatic retry heals a writer that died holding " +
      "the fact-table lease") {
    // The reference's Airflow retry self-heals after a task crash
    // because Postgres MVCC releases a dead connection's locks; our
    // parquet lease must not dead-end the same policy. Simulate the
    // kill -9 aftermath: day 2 crashed after ODS landed but before the
    // star/marts, leaving the fact table's lease held by a dead pid on
    // THIS host.
    val whL = Files.createTempDirectory("graft-wh-lease").toString
    Pipeline.runDaily(spark, landing, whL, "2024-05-01")
    Pipeline.runDaily(spark, landing, whL, "2024-05-02")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    Seq(Pipeline.martRoyaltiesPath(whL), Pipeline.martAvgPath(whL),
      Pipeline.martAppearancesPath(whL)).foreach { m =>
      graft.engine.Manifest.rollback(spark, m,
        graft.engine.Manifest.currentVersion(spark, m).get - 1)
    }
    val lease = new org.apache.hadoop.fs.Path(
      Pipeline.factPath(whL) + ".__writer_lease")
    val host = java.net.InetAddress.getLocalHost.getHostName
    val deadPid = Iterator.iterate(4400000L)(_ + 1)
      .find(p => ProcessHandle.of(p).isEmpty).get
    val out = fs.create(lease, false)
    out.write(s"host=$host pid=$deadPid acquired=crash".getBytes("UTF-8"))
    out.close()
    // the automatic-retry path completes the day; no human breakLease
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(Pipeline.backfill(spark, landing, whL, retries = 5,
      retrySleep = delays.append) === Seq("2024-05-02"))
    // acquisition self-heals on the FIRST attempt — no retry burned
    assert(delays.isEmpty)
    assert(!fs.exists(lease))
    assert(graft.engine.Manifest.read(spark, Pipeline.odsPath(whL)).count() === 66)
    assert(graft.engine.Manifest.read(spark, Pipeline.factPath(whL)).count() === 66)
    assert(graft.engine.Manifest.read(spark, Pipeline.martRoyaltiesPath(whL))
      .filter(col("date") === "2024-05-02").count() > 0)
  }

  test("a crash between the dim and fact publishes is healed by " +
      "re-running the day") {
    // The reference's DAG-3 runs dims and fact as separate transactions
    // (`from_ods_to_dds_pg.py`), so a crash between them is a reachable
    // state in both systems; the idempotent re-run must complete the
    // star without duplicating dims, ids, or fact rows.
    val whC = Files.createTempDirectory("graft-wh-dimcrash").toString
    Pipeline.runDaily(spark, landing, whC, "2024-05-01")
    Pipeline.runDaily(spark, landing, whC, "2024-05-02")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // reconstruct the crash state: dims HOLD day-2 entries, but day 2's
    // fact and mart commits never published (manifests rolled back one
    // version; the day-2 files stay behind as pre-commit orphans)
    Seq(Pipeline.martRoyaltiesPath(whC), Pipeline.martAvgPath(whC),
      Pipeline.martAppearancesPath(whC), Pipeline.factPath(whC)).foreach { m =>
      graft.engine.Manifest.rollback(spark, m,
        graft.engine.Manifest.currentVersion(spark, m).get - 1)
    }
    val dimsBefore = Seq(Pipeline.dimSongPath(whC),
      Pipeline.dimArtistPath(whC), Pipeline.dimCountryPath(whC))
      .map(p => p -> graft.engine.Manifest.read(spark, p).collect().map(_.toSeq).toSet)
    assert(graft.engine.Manifest.read(spark, Pipeline.factPath(whC)).count() === 33)
    assert(Pipeline.backfill(spark, landing, whC) === Seq("2024-05-02"))
    // star complete again...
    val fact = graft.engine.Manifest.read(spark, Pipeline.factPath(whC))
    assert(fact.count() === 66)
    // ...duplicate-free on the fact natural key...
    assert(fact.select("date", "country_id", "song_rank").distinct()
      .count() === 66)
    // ...and the repair re-derived the SAME dims, byte for byte — ids
    // assigned before the crash stayed stable through the replay
    dimsBefore.foreach { case (p, before) =>
      assert(graft.engine.Manifest.read(spark, p).collect().map(_.toSeq).toSet === before,
        s"repair changed $p")
    }
    // marts restored and keyed uniquely per (date, name)
    val roy = graft.engine.Manifest.read(spark, Pipeline.martRoyaltiesPath(whC))
    assert(roy.filter(col("date") === "2024-05-02").count() > 0)
    assert(roy.select("date", "artist_name").distinct().count() === roy.count())
  }

  test("checked runDaily survives a poison file and persists the quarantine") {
    val wh5 = Files.createTempDirectory("graft-wh-checked").toString
    val land5 = Files.createTempDirectory("graft-landing-poison").toString
    val src = java.nio.file.Paths.get(landing, "2024-05-01")
    val dst = java.nio.file.Paths.get(land5, "2024-05-01")
    Files.createDirectories(dst)
    java.nio.file.Files.list(src).forEach(f =>
      java.nio.file.Files.copy(f, dst.resolve(f.getFileName.toString)))
    // poison lands next to the real files
    java.nio.file.Files.writeString(
      dst.resolve("Atlantis_2024-05-01.json"), """{ "tracks": { "track": [""")
    // strict mode dies on this feed (PERMISSIVE is off); checked survives
    Pipeline.runDaily(spark, land5, wh5, "2024-05-01", checked = true)
    assert(graft.engine.Manifest.read(spark, Pipeline.odsPath(wh5)).count() === 33)
    val q = graft.engine.Manifest.read(spark, s"${Pipeline.quarantinePath(wh5)}/day=2024-05-01")
      .select("reason").as[String].collect().toList
    assert(q === List("malformed_json"))
    // replay: same warehouse, no duplicated quarantine rows
    Pipeline.runDaily(spark, land5, wh5, "2024-05-01", checked = true)
    assert(graft.engine.Manifest.read(spark, s"${Pipeline.quarantinePath(wh5)}/day=2024-05-01")
      .count() === 1)
    assert(graft.engine.Manifest.read(spark, Pipeline.odsPath(wh5)).count() === 33)
    // unattended catch-up with the same poison: checked backfill routes
    // it instead of aborting (fresh warehouse, both days from landing)
    val day2src = java.nio.file.Paths.get(landing, "2024-05-02")
    val day2dst = java.nio.file.Paths.get(land5, "2024-05-02")
    Files.createDirectories(day2dst)
    java.nio.file.Files.list(day2src).forEach(f =>
      java.nio.file.Files.copy(f, day2dst.resolve(f.getFileName.toString)))
    val wh6 = Files.createTempDirectory("graft-wh-checked-bf").toString
    assert(Pipeline.backfill(spark, land5, wh6, checked = true) ===
      Seq("2024-05-01", "2024-05-02"))
    assert(graft.engine.Manifest.read(spark, Pipeline.odsPath(wh6)).count() === 66)
  }

  test("backfill skips a landed date dir that has no files yet") {
    val wh4 = Files.createTempDirectory("graft-wh-empty").toString
    val land2 = Files.createTempDirectory("graft-landing-empty").toString
    // copy one real day, plus one created-but-unwritten drop dir
    val src = java.nio.file.Paths.get(landing, "2024-05-01")
    val dst = java.nio.file.Paths.get(land2, "2024-05-01")
    Files.createDirectories(dst)
    java.nio.file.Files.list(src).forEach(f =>
      java.nio.file.Files.copy(f, dst.resolve(f.getFileName.toString)))
    Files.createDirectories(java.nio.file.Paths.get(land2, "2024-05-03"))
    assert(Pipeline.backfill(spark, land2, wh4) === Seq("2024-05-01"))
  }
}
