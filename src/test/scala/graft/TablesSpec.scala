package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** `events.ts` encoding detection (Tables.t): the driver testdata has
  * shipped the column both as parquet TIMESTAMP(NANOS) — unreadable by
  * Spark's timestamp path, historically read as raw INT64 + ns→µs
  * truncation — and as native TIMESTAMP(MICROS). The reader must yield
  * the same instants from either file, detected per-file, not assumed.
  * (Round 7 lesson: the testdata regeneration flipped NANOS→MICROS and
  * a unit assumption silently shifted every event into 1970.)
  */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val instants = Seq(
    (1L, Timestamp.valueOf("2024-01-01 00:00:07.179575"), 10L),
    (2L, Timestamp.valueOf("2024-02-29 23:59:59.999999"), 20L),
    (3L, Timestamp.valueOf("2024-06-15 12:30:00.0"), 30L))

  private def base = instants
    .toDF("event_id", "tts", "user_id")
    .withColumn("event_type", lit("click"))
    .withColumn("value", lit(1.5))
    .withColumn("props", lit("{}"))

  private def dirWith(tsCol: String => org.apache.spark.sql.Column): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-tables-spec").toString
    base.withColumn("ts", tsCol("tts")).drop("tts")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readTs(dir: String): Seq[(Long, Timestamp)] = {
    val df = Tables.t(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    df.select(col("event_id"), col("ts")).as[(Long, Timestamp)]
      .collect().toSeq.sortBy(_._1)
  }

  test("native TIMESTAMP(MICROS) events file is read as-is") {
    val dir = dirWith(c => col(c))
    assert(readTs(dir) === instants.map(r => (r._1, r._2)))
  }

  test("tz-naive TIMESTAMP_NTZ file (pyarrow default) normalizes to " +
      "TimestampType at identical instants under the UTC session zone") {
    val dir = dirWith(c => col(c).cast("timestamp_ntz"))
    assert(readTs(dir) === instants.map(r => (r._1, r._2)))
  }

  test("legacy INT64-nanos events file falls back to ns->us truncation") {
    val dir = dirWith(c => expr(s"unix_micros($c) * 1000L"))
    assert(readTs(dir) === instants.map(r => (r._1, r._2)))
  }

  test("both encodings agree column-for-column") {
    val micros = Tables.t(spark, dirWith(c => col(c)), "events")
    val nanos =
      Tables.t(spark, dirWith(c => expr(s"unix_micros($c) * 1000L")), "events")
    assert(micros.schema === nanos.schema)
    assert(micros.except(nanos).isEmpty && nanos.except(micros).isEmpty)
  }
}
