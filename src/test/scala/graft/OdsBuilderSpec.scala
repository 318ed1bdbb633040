package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.OdsBuilder

/** Ingest-path units over the authored fixture set (FIXTURES.md A1):
  * 6 files = 3 countries × 2 dates, 11 tracks each after the in-file
  * duplicate rank is dropped.
  */
class OdsBuilderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val ods = OdsBuilder.ingest(spark).cache()

  test("ingest yields 66 deduped ODS rows (11 per (country, date) file)") {
    assert(ods.count() === 66)
  }

  test("first-wins dedup keeps the earlier array element for a duplicate rank") {
    // The US files carry a second rank-7 entry ("Song DupRank") after the
    // main list; ON CONFLICT semantics keep the earlier one.
    val kept = ods.filter(col("country") === "United States" && col("song_rank") === 7)
      .select("song_name").collect().map(_.getString(0)).toSet
    assert(kept === Set("Song 10", "Song 11"))
    assert(ods.filter(col("song_name") === "Song DupRank").count() === 0)
  }

  test("countries with spaces are recovered from URI-encoded file names") {
    val cs = ods.select("country").distinct().collect().map(_.getString(0)).toSet
    assert(cs === Set("Russian Federation", "United States", "Kazakhstan"))
  }

  test("JSON string fields are cast to typed columns") {
    val f = ods.schema.fields.map(x => x.name -> x.dataType).toMap
    assert(f("duration_sec") === IntegerType)
    assert(f("listeners_count") === IntegerType)
    assert(f("song_rank") === IntegerType)
    assert(f("source_date") === DateType)
    assert(f("song_name") === StringType)
  }

  test("zero-duration rows survive to ODS (imputation is downstream)") {
    assert(ods.filter(col("duration_sec") === 0).count() === 2)
  }

  test("ODS key (song_rank, source_date, country) is unique") {
    assert(ods.groupBy("song_rank", "source_date", "country").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("typed Dataset[OdsRow] boundary round-trips the same rows") {
    val typed = graft.ingest.OdsBuilder.ingestTyped(spark)
    assert(typed.count() === 66)
    // typed transformation: per-row listener cents, compile-checked fields
    val top = typed.filter(_.song_rank == 1)
      .map(r => (r.country, r.listeners_count))(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaInt))
      .collect().toMap
    assert(top.keySet === Set("Russian Federation", "United States", "Kazakhstan"))
  }

  test("checked ingest quarantines poison files and unparseable rows, keeps the rest") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-quarantine").toString
    val day = java.nio.file.Paths.get(root, "2024-06-01")
    java.nio.file.Files.createDirectories(day)
    def doc(tracks: String) =
      s"""{\n    "tracks": {\n        "track": [\n$tracks\n        ]\n    }\n}"""
    def track(name: String, rank: String, dur: String) =
      s"""{"name": "$name", "duration": "$dur", "listeners": "100",
         |"artist": {"name": "A"}, "@attr": {"rank": "$rank"}}""".stripMargin
    // good file: 2 clean tracks
    java.nio.file.Files.writeString(day.resolve("GoodLand_2024-06-01.json"),
      doc(track("s1", "1", "100") + ",\n" + track("s2", "2", "200")))
    // poison file: truncated JSON — must not kill the read
    java.nio.file.Files.writeString(day.resolve("BadLand_2024-06-01.json"),
      """{ "tracks": { "track": [ {"name": "x", """)
    // mixed file: one clean track, one with a non-numeric duration
    java.nio.file.Files.writeString(day.resolve("MixedLand_2024-06-01.json"),
      doc(track("ok", "1", "300") + ",\n" + track("broken", "2", "3m20s")))
    // valid JSON, wrong shape: the live API's error payload
    java.nio.file.Files.writeString(day.resolve("ErrLand_2024-06-01.json"),
      """{ "error": 29, "message": "Rate limit exceeded" }""")

    val res = OdsBuilder.ingestChecked(spark, root)
    val good = res.ods.select("country", "song_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(good === Set(("GoodLand", "s1"), ("GoodLand", "s2"),
      ("MixedLand", "ok")))
    val q = res.quarantine.select("reason", "src_file")
      .collect().map(r => (r.getString(0),
        r.getString(1).split('/').last)).toSet
    assert(q === Set(("malformed_json", "BadLand_2024-06-01.json"),
      ("bad_track_row", "MixedLand_2024-06-01.json"),
      ("missing_tracks", "ErrLand_2024-06-01.json")))
  }
}
