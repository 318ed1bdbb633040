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
    assert(spark.read.parquet(Pipeline.odsPath(wh)).count() === 33)
    assert(spark.read.parquet(Pipeline.factPath(wh)).count() === 33)
    val songsDay1 = spark.read.parquet(Pipeline.dimSongPath(wh))
      .as[(Long, String, Long)].collect().toSet
    val artistsDay1 = spark.read.parquet(Pipeline.dimArtistPath(wh))
      .as[(Long, String)].collect().toSet

    Pipeline.runDaily(spark, landing, wh, "2024-05-02")
    assert(spark.read.parquet(Pipeline.odsPath(wh)).count() === 66)
    assert(spark.read.parquet(Pipeline.factPath(wh)).count() === 66)

    // serial semantics: every day-1 id survives day 2 unchanged
    val songsDay2 = spark.read.parquet(Pipeline.dimSongPath(wh))
      .as[(Long, String, Long)].collect().toSet
    assert(songsDay1.subsetOf(songsDay2))
    assert(songsDay2.size > songsDay1.size, "day 2 should add new song keys")
    val artistsDay2 = spark.read.parquet(Pipeline.dimArtistPath(wh))
      .as[(Long, String)].collect().toSet
    assert(artistsDay2 === artistsDay1, "no new artists on day 2")

    // ids are dense and unique
    val ids = songsDay2.map(_._1)
    assert(ids === (1L to ids.size).toSet)
  }

  test("replaying a day is a no-op for every table") {
    val before = Seq(Pipeline.odsPath(wh), Pipeline.factPath(wh),
      Pipeline.dimSongPath(wh), Pipeline.martRoyaltiesPath(wh))
      .map(p => p -> spark.read.parquet(p).count()).toMap
    Pipeline.runDaily(spark, landing, wh, "2024-05-02")
    before.foreach { case (p, n) =>
      assert(spark.read.parquet(p).count() === n, s"replay changed $p")
    }
  }

  test("incremental royalties mart equals the full single-pass rebuild") {
    val incremental = spark.read.parquet(Pipeline.martRoyaltiesPath(wh))
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
    assert(spark.read.parquet(Pipeline.odsPath(wh2)).count() === 66)
    // warehouse now matches the in-order build (same marts, same rows)
    val royalties = spark.read.parquet(Pipeline.martRoyaltiesPath(wh2)).count()
    assert(royalties === spark.read.parquet(Pipeline.martRoyaltiesPath(wh)).count())
    // fully caught up -> nothing to do
    assert(Pipeline.backfill(spark, landing, wh2) === Seq.empty)
  }

  test("backfill repairs a day that crashed after ODS but before the marts") {
    val wh3 = Files.createTempDirectory("graft-wh-repair").toString
    Pipeline.runDaily(spark, landing, wh3, "2024-05-01")
    Pipeline.runDaily(spark, landing, wh3, "2024-05-02")
    // simulate a crash mid-run: day 2's marts vanish but its ODS stays
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    Seq(Pipeline.martRoyaltiesPath(wh3), Pipeline.martAvgPath(wh3),
      Pipeline.martAppearancesPath(wh3)).foreach { m =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$m/date=2024-05-02"), true)
    }
    // done-marker is the LAST-written table, so the day is re-run
    assert(Pipeline.backfill(spark, landing, wh3) === Seq("2024-05-02"))
    assert(spark.read.parquet(Pipeline.martRoyaltiesPath(wh3))
      .filter(col("date") === "2024-05-02").count() > 0)
    // ODS replay inside the repair appended nothing new
    assert(spark.read.parquet(Pipeline.odsPath(wh3)).count() === 66)
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
    assert(spark.read.parquet(Pipeline.odsPath(wh5)).count() === 33)
    val q = spark.read.parquet(s"${Pipeline.quarantinePath(wh5)}/day=2024-05-01")
      .select("reason").as[String].collect().toList
    assert(q === List("malformed_json"))
    // replay: same warehouse, no duplicated quarantine rows
    Pipeline.runDaily(spark, land5, wh5, "2024-05-01", checked = true)
    assert(spark.read.parquet(s"${Pipeline.quarantinePath(wh5)}/day=2024-05-01")
      .count() === 1)
    assert(spark.read.parquet(Pipeline.odsPath(wh5)).count() === 33)
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
    assert(spark.read.parquet(Pipeline.odsPath(wh6)).count() === 66)
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
