package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.JoinQueries

/** Edge semantics of the temporal joins on authored rows: ASOF tie and
  * no-match behavior, range-join boundary inclusivity, and the
  * exactly-once guarantee of the bucket-probe shape.
  */
class JoinQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val H = 3600L * 1000000 // one hour in µs

  /** Write an events.parquet shaped like the driver's (ns INT64 ts, read
    * back through Tables.t). Rows: (event_id, user_id, µs, type).
    */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("join_events").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val data = rows.map { case (id, uid, us, tpe) =>
      Row(id, us * 1000L, uid, tpe, 1.0, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("asof join: equal timestamp matches (>=), earlier click wins over none") {
    val dir = eventsDir(Seq(
      (1L, 7L, 1000L, "click"),
      (2L, 7L, 1000L, "error"),   // same µs as click 1 → matches it
      (3L, 7L, 5000L, "error"),   // most recent prior click is still 1
      (4L, 8L, 2000L, "error"),   // user 8 has no click → dropped
      (5L, 7L, 6000L, "click"),
      (6L, 7L, 7000L, "error"))) // matches click 5, not 1
    val out = JoinQueries.qAsofJoin.run(spark, dir)
      .select("event_id", "gap_us").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((2L, 0L), (3L, 4000L), (6L, 1000L)))
  }

  test("range join: ±6h bounds are inclusive and each pair appears once") {
    val dir = eventsDir(Seq(
      (1L, 7L, 10L * H, "error"),
      (2L, 7L, 4L * H, "click"),        // exactly -6h → included
      (3L, 7L, 16L * H, "click"),       // exactly +6h → included
      (4L, 7L, 16L * H + 1, "click"),   // 1µs beyond → excluded
      (5L, 7L, 10L * H, "click"),       // same instant → included
      (6L, 9L, 10L * H, "click")))      // other user → excluded
    val out = JoinQueries.qRangeJoin.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, -6L * H), (1L, 3L, 6L * H), (1L, 5L, 0L)))
  }
}
