package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The JDBC mart landing (S7 fidelity note: the reference writes every
  * transformed table to Postgres) against an in-process Derby — the
  * embedded engine Spark already ships. Round trip + idempotent
  * per-date replace semantics.
  */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one in-memory db per suite run; Derby keeps it for the JVM lifetime
  private val url = "jdbc:derby:memory:graft_jdbc_spec;create=true"

  test("publishMart: per-date replace — replays never duplicate, other dates survive") {
    def slice(date: String, v: Double) = Seq(
      (java.sql.Date.valueOf(date), "US", v),
      (java.sql.Date.valueOf(date), "KZ", v + 1))
      .toDF("date", "country_name", "avg_duration")
    val d1 = java.sql.Date.valueOf("2024-05-01")
    val d2 = java.sql.Date.valueOf("2024-05-02")

    graft.engine.JdbcSink.publishMart(
      slice("2024-05-01", 1.0), url, "t_mart", "date", d1)
    graft.engine.JdbcSink.publishMart(
      slice("2024-05-02", 9.0), url, "t_mart", "date", d2)
    // replay day 1 with CHANGED values: replaces day 1, leaves day 2
    graft.engine.JdbcSink.publishMart(
      slice("2024-05-01", 5.0), url, "t_mart", "date", d1)

    val back = spark.read.jdbc(url, "t_mart", new java.util.Properties())
      .as[(java.sql.Date, String, Double)].collect().toSet
    assert(back === Set(
      (d1, "US", 5.0), (d1, "KZ", 6.0),
      (d2, "US", 9.0), (d2, "KZ", 10.0)))
  }

  test("publishEpoch: a replayed epoch is a no-op, a new epoch replaces " +
      "its slice, other slices survive") {
    def slice(date: String, v: Double) = Seq(
      (java.sql.Date.valueOf(date), "US", v),
      (java.sql.Date.valueOf(date), "KZ", v + 1))
      .toDF("date", "country_name", "avg_duration")
    val d1 = java.sql.Date.valueOf("2024-06-01")
    val d2 = java.sql.Date.valueOf("2024-06-02")
    def snapshot() = spark.read
      .jdbc(url, "t_epoch_mart", new java.util.Properties())
      .as[(java.sql.Date, String, Double)].collect().toSet

    assert(graft.engine.JdbcSink.publishEpoch(
      slice("2024-06-01", 1.0), url, "t_epoch_mart", Seq("date"), 0L))
    // failure-retry of epoch 0: even with drifted content, nothing lands
    assert(!graft.engine.JdbcSink.publishEpoch(
      slice("2024-06-01", 99.0), url, "t_epoch_mart", Seq("date"), 0L))
    assert(snapshot() === Set((d1, "US", 1.0), (d1, "KZ", 2.0)))
    // epoch 1 brings a second date; epoch 2 replaces day 1 only
    assert(graft.engine.JdbcSink.publishEpoch(
      slice("2024-06-02", 9.0), url, "t_epoch_mart", Seq("date"), 1L))
    assert(graft.engine.JdbcSink.publishEpoch(
      slice("2024-06-01", 5.0), url, "t_epoch_mart", Seq("date"), 2L))
    assert(snapshot() === Set(
      (d1, "US", 5.0), (d1, "KZ", 6.0),
      (d2, "US", 9.0), (d2, "KZ", 10.0)))
  }

  test("pipeline marts round-trip through the JDBC landing byte-equal") {
    val wh = Files.createTempDirectory("graft-jdbc-wh").toString
    val landing = graft.ingest.OdsBuilder.fixtureRoot
    Pipeline.runDaily(spark, landing, wh, "2024-05-01")
    Pipeline.publishMartsJdbc(spark, wh, url, "2024-05-01")
    // idempotency at the pipeline level too
    Pipeline.publishMartsJdbc(spark, wh, url, "2024-05-01")

    for ((path, table) <- Seq(
      Pipeline.martAvgPath(wh) -> "dm_avg_song_duration_by_country",
      Pipeline.martAppearancesPath(wh) -> "dm_artist_appearances_by_date",
      Pipeline.martRoyaltiesPath(wh) -> "dm_expected_artist_royalties_by_date")) {
      val want = spark.read.parquet(path)
        .filter(col("date") === lit("2024-05-01").cast("date"))
      val got = spark.read.jdbc(url, table, new java.util.Properties())
      assert(got.count() === want.count(), s"$table row count")
      assert(got.exceptAll(want.select(got.columns.map(col): _*)).isEmpty,
        s"$table rows diverge from the parquet mart")
    }
  }
}
