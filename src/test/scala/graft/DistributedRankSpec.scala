package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.DistributedRank

/** The distributed rank/cumsum/ntile must agree with the single-task
  * window forms it replaces, bit for bit, on every geometry — including
  * n < k ntile, ties in the value column, and inputs spread over many
  * partitions (the case the global window collapses to one task).
  */
class DistributedRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 1000 rows, shuffled key order, deliberately many input partitions,
  // duplicate values (v has ~50 ties per value) — rank determinism
  // must come from the (v, k) total order, not partition luck.
  private def df = spark.range(0, 1000, 1, 17)
    .select(
      pmod(col("id") * 677, lit(1000)).as("k"),
      pmod(col("id"), lit(20)).as("v"))

  test("rank matches row_number over the same total order") {
    val got = DistributedRank.rank(df, Seq(col("v"), col("k")), "r")
      .orderBy(col("r")).collect().map(r => (r.getLong(0), r.getLong(2)))
    val want = df.withColumn("r",
      row_number().over(Window.orderBy(col("v"), col("k"))).cast("long"))
      .orderBy(col("r")).collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
  }

  test("cumsum matches the running-total window, totals attached from phase 1") {
    val got = DistributedRank(df, Seq(col("v"), col("k")),
      DistributedRank.Spec(valueCol = Some("v"), cumCol = Some("cum"),
        countCol = Some("n"), totalCol = Some("tot")))
    val rows = got.orderBy(col("k")).collect()
    val want = df.withColumn("cum", sum(col("v")).over(
      Window.orderBy(col("v"), col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("k")).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      want.map(r => (r.getLong(0), r.getLong(2))).toSeq)
    val exactTotal = df.agg(sum(col("v"))).head().getLong(0)
    assert(rows.forall(r => r.getLong(3) === 1000L))
    assert(rows.forall(r => r.getLong(4) === exactTotal))
  }

  test("ntile matches SQL NTILE for k dividing n, k not dividing n, and k > n") {
    for (k <- Seq(10, 7, 1, 1500)) {
      val got = DistributedRank.ntile(df, Seq(col("v"), col("k")), k, "b")
        .groupBy(col("b")).count().orderBy(col("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = df.withColumn("b",
        ntile(k).over(Window.orderBy(col("v"), col("k"))).cast("long"))
        .groupBy(col("b")).count().orderBy(col("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq === want.toSeq, s"ntile($k) bucket sizes diverge")
    }
  }

  test("ntile assigns the same bucket to the same row as the window form") {
    val got = DistributedRank.ntile(df, Seq(col("v"), col("k")), 7, "b")
      .orderBy(col("k")).collect().map(r => (r.getLong(0), r.getLong(2)))
    val want = df.withColumn("b",
      ntile(7).over(Window.orderBy(col("v"), col("k"))).cast("long"))
      .orderBy(col("k")).collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
  }

  test("deterministic across executions") {
    val a = DistributedRank.rank(df, Seq(col("v"), col("k")), "r")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val b = DistributedRank.rank(df, Seq(col("v"), col("k")), "r")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("empty input yields empty output with totals = 0") {
    val empty = df.filter(col("v") < 0)
    val got = DistributedRank(empty, Seq(col("v")),
      DistributedRank.Spec(rankCol = Some("r"), valueCol = Some("v"),
        cumCol = Some("c"), countCol = Some("n")))
    assert(got.count() === 0L)
  }

  test("precmin matches the exclusive running-min window, NULL first row") {
    val got = DistributedRank.precmin(df, Seq(col("v"), col("k")), "v", "pm")
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getLong(2)))
    val want = df.withColumn("pm", min(col("v")).over(
      Window.orderBy(col("v"), col("k"))
        .rowsBetween(Window.unboundedPreceding, -1)))
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getLong(2)))
    assert(got.toSeq === want.toSeq)
    // the global first row (and only it) must be NULL
    assert(got.count(_._2 == null) === 1)
  }

  test("precmin is exclusive under ties: equal values see earlier equals") {
    // rows (k, v): v=5 appears three times — the 2nd and 3rd occurrence
    // must see 5 (an EARLIER equal), not only strictly smaller values
    val tied = Seq((1L, 9L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 7L))
      .toDF("k", "v")
    val got = DistributedRank.precmin(tied, Seq(col("v"), col("k")), "v", "pm")
      .orderBy(col("k")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getLong(2)))
    assert(got.toSeq === Seq((1L, 5L), (2L, null), (3L, 5L), (4L, 5L),
      (5L, 5L)))
  }

  test("no unpartitioned WindowExec appears in the plan") {
    val got = DistributedRank.rank(df, Seq(col("v"), col("k")), "r")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window leaked into:\n$plan")
  }
}
