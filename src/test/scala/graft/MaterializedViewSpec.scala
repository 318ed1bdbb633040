package graft

import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Incremental, Manifest, MaterializedViews, Upsert}

/** Automatic MV rewrite ([[graft.engine.MaterializedViews]]): a query
  * re-stating the mart's defining computation over the SOURCE is
  * answered from the mart (plan-proven via inputFiles), a stale mart
  * stops matching instead of answering wrong, a refresh re-arms the
  * rewrite, non-matching computations are left alone, and the rewrite
  * fires for the defining SUBTREE inside a larger query.
  */
class MaterializedViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d1 = Date.valueOf("2024-07-01")
  private val d2 = Date.valueOf("2024-07-02")

  private def computeMart(df: DataFrame): DataFrame =
    df.groupBy(col("d"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))

  /** Fresh (source, mart) pair with the MV registered. */
  private def fixture(name: String): (String, String) = {
    val base = Files.createTempDirectory("graft-mv").toString
    val src = s"$base/src"; val mart = s"$base/mart"
    Upsert.upsertPartitioned(spark, src,
      Seq((1, d1, 100L), (2, d1, 200L), (3, d2, 300L))
        .toDF("k", "d", "cents"), Seq("k", "d"), "d")
    Incremental.refresh(spark, src, mart, "d")(computeMart)
    MaterializedViews.register(spark, name, src, mart)(computeMart)
    (src, mart)
  }

  private def defining(src: String): DataFrame =
    computeMart(Manifest.read(spark, src))

  private def rows(df: DataFrame): Set[(Date, Long, Long)] =
    df.select("d", "n", "sum_cents")
      .as[(Date, Long, Long)].collect().toSet

  test("the defining query is answered from the mart, bit-equal") {
    val (src, mart) = fixture("mv_basic")
    try {
      val q = defining(src)
      assert(q.inputFiles.nonEmpty && q.inputFiles.forall(_.contains(mart)),
        s"expected a mart-only scan, got ${q.inputFiles.mkString(", ")}")
      assert(rows(q) === Set((d1, 2L, 300L), (d2, 1L, 300L)))
    } finally MaterializedViews.deregister(spark, "mv_basic")
  }

  test("a stale mart stops matching; a refresh re-arms the rewrite") {
    val (src, mart) = fixture("mv_stale")
    try {
      Upsert.mergePartitioned(spark, src,
        Seq((1, d1, 150L)).toDF("k", "d", "cents"), Seq("k", "d"), "d")
      val stale = defining(src)
      assert(stale.inputFiles.forall(_.contains(src)),
        s"stale mart must NOT answer: ${stale.inputFiles.mkString(", ")}")
      assert(rows(stale) === Set((d1, 2L, 350L), (d2, 1L, 300L)))
      Incremental.refresh(spark, src, mart, "d")(computeMart)
      val fresh = defining(src)
      assert(fresh.inputFiles.forall(_.contains(mart)))
      assert(rows(fresh) === Set((d1, 2L, 350L), (d2, 1L, 300L)))
    } finally MaterializedViews.deregister(spark, "mv_stale")
  }

  test("a different computation over the same source is left alone") {
    val (src, _) = fixture("mv_other")
    try {
      val other = Manifest.read(spark, src).groupBy(col("d"))
        .agg(max(col("cents")).as("max_cents"))
      assert(other.inputFiles.forall(_.contains(src)))
      assert(other.as[(Date, Long)].collect().toSet ===
        Set((d1, 200L), (d2, 300L)))
    } finally MaterializedViews.deregister(spark, "mv_other")
  }

  test("the rewrite fires for the defining subtree inside a larger query") {
    val (src, mart) = fixture("mv_compose")
    try {
      val q = defining(src)
        .filter(col("n") > 1L)
        .orderBy(col("d"))
        .select(col("d"), (col("sum_cents") / col("n")).as("avg_cents"))
      assert(q.inputFiles.forall(_.contains(mart)),
        s"expected the subtree rewrite, got ${q.inputFiles.mkString(", ")}")
      assert(q.as[(Date, Double)].collect().toSeq === Seq((d1, 150.0)))
    } finally MaterializedViews.deregister(spark, "mv_compose")
  }
}
