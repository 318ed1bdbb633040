package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TpchFull

/** Plan-shape and sanity gates for the 13 TpchFull queries (values are
  * hash-checked by the driver's DuckDB oracle; these tests pin the
  * EXECUTION shapes that make each query scale).
  */
class TpchFullSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q4: EXISTS runs as a left-semi join, not a row-multiplying inner") {
    val p = finalPlan(TpchFull.q4OrderPriority.run(spark, dir))
    assert(p.contains("LeftSemi"), s"no semi join in:\n$p")
  }

  test("q16: NOT IN exclusion runs as a left-anti join") {
    val p = finalPlan(TpchFull.q16SupplierCount.run(spark, dir))
    assert(p.contains("LeftAnti"), s"no anti join in:\n$p")
  }

  test("q21: no non-equi self-join — the EXISTS pair is two aggregates") {
    val p = finalPlan(TpchFull.q21WaitingSupplier.run(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$p")
  }

  test("q2: per-part minimum is a window, not a self-join") {
    val df = TpchFull.q2MinCostSupplier.run(spark, dir)
    assert(finalPlan(df).contains("Window"))
  }

  test("q15: ties on the exact-decimal max all surface") {
    // The max-revenue equality must match at least one supplier.
    assert(TpchFull.q15TopSupplier.run(spark, dir).count() >= 1)
  }

  test("q6/q12/q17: single-row or tiny grouped aggregates return rows") {
    assert(TpchFull.q6ForecastRevenue.run(spark, dir).count() == 1)
    assert(TpchFull.q12PriorityLines.run(spark, dir).count() >= 1)
    assert(TpchFull.q17SmallQty.run(spark, dir).count() == 1)
  }
}
