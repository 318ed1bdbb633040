package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ordering semantics of the funnel/retention/chunking operators on
  * authored edge-case rows — the cases a random events table cannot be
  * relied on to contain.
  */
class EventQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, Timestamp, Long, String)]) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-events-spec").toString
    // Author the fixture as raw INT64 NANOS — the legacy testdata
    // encoding — so this spec keeps exercising Tables.t's ns fallback
    // (current driver testdata is native TIMESTAMP(MICROS)).
    rows.toDF("event_id", "tts", "user_id", "event_type")
      .withColumn("ts", expr("unix_micros(tts) * 1000L")).drop("tts")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel stages only count strictly after the previous stage") {
    val dir = run(Seq(
      // user 1: click BEFORE signup (doesn't count), none after -> stage 1
      (1L, t("2024-05-01 09:00:00"), 1L, "click"),
      (2L, t("2024-05-01 10:00:00"), 1L, "signup"),
      // user 2: full ordered funnel -> stage 3
      (3L, t("2024-05-01 10:00:00"), 2L, "signup"),
      (4L, t("2024-05-01 10:05:00"), 2L, "click"),
      (5L, t("2024-05-01 10:10:00"), 2L, "purchase"),
      // user 3: purchase BETWEEN signup and click (doesn't count) -> stage 2
      (6L, t("2024-05-01 10:00:00"), 3L, "signup"),
      (7L, t("2024-05-01 10:02:00"), 3L, "purchase"),
      (8L, t("2024-05-01 10:05:00"), 3L, "click"),
      // user 4: never signed up -> absent from the funnel
      (9L, t("2024-05-01 10:00:00"), 4L, "purchase")))
    val got = graft.queries.EventQueries.qFunnel.run(spark, dir)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 3L, 3L -> 2L))
  }

  test("retention counts each user once per active day, offset from first day") {
    val dir = run(Seq(
      (1L, t("2024-05-01 10:00:00"), 1L, "click"),
      (2L, t("2024-05-01 18:00:00"), 1L, "view"),   // same day: one active row
      (3L, t("2024-05-03 10:00:00"), 1L, "click"),  // offset 2
      (4L, t("2024-05-02 09:00:00"), 2L, "signup")))
    val got = graft.queries.EventQueries.qRetention.run(spark, dir)
      .as[(java.sql.Date, Long, Long)].collect().toSet
    assert(got === Set(
      (java.sql.Date.valueOf("2024-05-01"), 0L, 1L),
      (java.sql.Date.valueOf("2024-05-01"), 2L, 1L),
      (java.sql.Date.valueOf("2024-05-02"), 0L, 1L)))
  }

  test("chunking covers every char once per stride with a bounded tail") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-chunks-spec").toString
    Seq(
      (1L, "", "en", "web", 0L),            // empty: no chunks
      (2L, "x", "en", "web", 1L),           // single char: one chunk
      (3L, "a" * 150, "en", "web", 150L),   // exactly one stride: one chunk
      (4L, "b" * 151, "en", "web", 151L),   // one past: second chunk of 1
      (5L, "c" * 400, "en", "web", 400L))   // 400 chars: starts 0,150,300
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.DocQueries.qDocChunks.run(spark, dir)
      .select("doc_id", "chunk_idx", "chunk_chars")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (2L, 0L, 1L),
      (3L, 0L, 150L),
      (4L, 0L, 151L), (4L, 1L, 1L),
      (5L, 0L, 200L), (5L, 1L, 200L), (5L, 2L, 100L)))
  }

  test("multitouch credit sums to the purchase value per conversion") {
    // Real testdata: every conversion's credited cents must equal its
    // exact purchase cents (the remainder-to-last-touch invariant), and
    // singles take 100%.
    val dir = "/root/testdata/sf0.001"
    val touches = graft.queries.EventQueries.qMultitouch.run(spark, dir)
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
    val conv = graft.engine.Tables.t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), cents.as("cents"))
    val mismatched = touches.groupBy(col("conv_id"))
      .agg(sum(col("credit_cents")).as("credited"))
      .join(conv, Seq("conv_id"))
      .filter(col("credited") =!= col("cents"))
      .count()
    assert(mismatched === 0L, "credit must conserve the purchase value")
    val singles = touches.filter(col("cnt") === 1)
      .join(conv, Seq("conv_id"))
      .filter(col("credit_cents") =!= col("cents")).count()
    assert(singles === 0L, "single-touch conversions take 100%")
    // two-touch journeys split 50/50 (floor to the first, slack to the
    // last) — the U-model's middle 20% redistributes, it does not
    // silently accrue to the last touch
    val lopsided = touches.filter(col("cnt") === 2 && col("rn") === 1)
      .join(conv, Seq("conv_id"))
      .filter(col("credit_cents") =!=
        call_function("div", col("cents") * 50, lit(100L))).count()
    assert(lopsided === 0L, "two-touch first credit must be half")
  }
}
