package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Authored edge cases for the warehouse-lifecycle operators (SCD2
  * versioning, range-frame windows, DQ audit, bloom pruning) — the
  * boundary rows a random table cannot be relied on to contain.
  */
class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Author an events fixture in the driver testdata's encoding
    * (TIMESTAMP(NANOS) as raw INT64 — see Tables.t). */
  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-warehouse-spec").toString
    rows.toDF("event_id", "tts", "user_id", "event_type", "value")
      .withColumn("ts", expr("unix_micros(tts) * 1000L")).drop("tts")
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("scd2 collapses consecutive duplicates and closes versions with the next change") {
    val dir = eventsDir(Seq(
      // user 1: 10 -> 10 (no new version) -> 25 -> 25 -> 10
      (1L, ts("2024-05-01 10:00:00"), 1L, "purchase", 10.0),
      (2L, ts("2024-05-01 11:00:00"), 1L, "purchase", 10.0),
      (3L, ts("2024-05-01 12:00:00"), 1L, "purchase", 25.0),
      (4L, ts("2024-05-01 13:00:00"), 1L, "purchase", 25.0),
      (5L, ts("2024-05-01 14:00:00"), 1L, "purchase", 10.0),
      // non-purchase noise must be invisible to the log
      (6L, ts("2024-05-01 10:30:00"), 1L, "click", 99.0),
      // user 2: single event -> one open version
      (7L, ts("2024-05-01 10:00:00"), 2L, "purchase", 7.5)))
    val rows = graft.queries.WarehouseQueries.qScd2.run(spark, dir)
      .as[(Long, Long, Double, Timestamp, Option[Timestamp], Boolean)]
      .collect().toList
    assert(rows === List(
      (1L, 1L, 10.0, ts("2024-05-01 10:00:00"), Some(ts("2024-05-01 12:00:00")), false),
      (1L, 2L, 25.0, ts("2024-05-01 12:00:00"), Some(ts("2024-05-01 14:00:00")), false),
      (1L, 3L, 10.0, ts("2024-05-01 14:00:00"), None, true),
      (2L, 1L, 7.5, ts("2024-05-01 10:00:00"), None, true)))
    // invariant: exactly one current version per user, valid_to chains
    val currents = rows.groupBy(_._1).values.map(_.count(_._6))
    assert(currents.forall(_ == 1))
  }

  test("range frame includes the exact 1h boundary and excludes beyond it") {
    val dir = eventsDir(Seq(
      (1L, ts("2024-05-01 09:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-05-01 09:30:00"), 1L, "view", 2.0),
      // 10:00: 09:00 is EXACTLY 3600s back -> included (closed frame)
      (3L, ts("2024-05-01 10:00:00"), 1L, "view", 4.0),
      // 10:30:01: 09:30 is 3601s back -> excluded
      (4L, ts("2024-05-01 10:30:01"), 1L, "view", 8.0)))
    val byId = graft.queries.WarehouseQueries.qWindowRangeFrame.run(spark, dir)
      .select("event_id", "n_1h", "sum_1h").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) === ((1L, 1.0)))
    assert(byId(2L) === ((2L, 3.0)))
    assert(byId(3L) === ((3L, 7.0))) // 09:00 exactly 3600s back: included
    assert(byId(4L) === ((2L, 12.0))) // 09:30 is 3601s back: aged out
  }

  test("dq audit counts authored violations exactly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dq-spec").toString
    Seq(
      // clean row
      (1L, 1, 10.0, 100.0, 0.1),
      // duplicate business key (1,1)
      (1L, 1, 5.0, 50.0, 0.0),
      // qty out of range + orphan orderkey
      (99L, 1, 51.0, 10.0, 0.2),
      // price not positive
      (2L, 1, 3.0, 0.0, 0.05))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(1L, 2L).toDF("o_orderkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val byName = graft.queries.WarehouseQueries.qDqAudit.run(spark, dir)
      .select("check_name", "violations", "pass").as[(String, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byName("dup_business_key") === ((1L, false)))
    assert(byName("qty_out_of_range") === ((1L, false)))
    assert(byName("price_not_positive") === ((1L, false)))
    assert(byName("orphan_orderkey") === ((1L, false)))
    assert(byName("discount_out_of_range") === ((0L, true)))
  }

  test("bloom pre-filter changes no results vs the plain join") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.WarehouseQueries.qBloomPrune.run(spark, dir)
      .select("s_suppkey", "n_items").as[(Long, Long)].collect().toList
    val sup = graft.engine.Tables.t(spark, dir, "supplier")
      .join(graft.engine.Tables.t(spark, dir, "nation")
        .filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
    val expected = graft.engine.Tables.t(spark, dir, "lineitem")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_items"))
      .orderBy(col("s_suppkey"))
      .as[(Long, Long)].collect().toList
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("bloom prune yields an empty result (not an error) on an empty dim") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bloom-empty-spec").toString
    Seq((1L, "S1", 0)).toDF("s_suppkey", "s_name", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // no nation matches NATION_3 -> empty dim
    Seq((0, "NATION_0")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 1L, 10.0, 0.1)).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    assert(graft.queries.WarehouseQueries.qBloomPrune.run(spark, dir).count() === 0L)
  }
}
