package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ZOrder

/** Z-order clustering: the Morton code math and the thing the layout is
  * FOR — parquet row-group skipping on 2-D box predicates.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference Morton interleave on the JVM, for cross-checking the
    * Column and SQL formulations.
    */
  private def mortonRef(a: Long, b: Long): Long =
    (0 until ZOrder.BitsPerCol).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the reference interleave (Column and SQL forms)") {
    val pairs = Seq((0L, 0L), (3L, 5L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65536L, 1L), (999999L, 123L))
    val df = pairs.toDF("a", "b")
    val viaColumn = df.select(ZOrder.zValue(col("a"), col("b"))).as[Long].collect()
    df.createOrReplaceTempView("zpairs")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.zValueSql("a", "b")} FROM zpairs").as[Long].collect()
    val expected = pairs.map { case (a, b) => mortonRef(a, b) }
    assert(viaColumn.toSeq === expected)
    assert(viaSql.toSeq === expected)
    // keys wider than 16 bits: high bits are masked off, low bits cluster
    assert(viaColumn(5) === mortonRef(0L, 1L))
  }

  /** Rows emitted by the file scan — after row-group statistics pruning,
    * before the residual filter. The number the layout exists to shrink.
    */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    scan.metrics("numOutputRows").value
  }

  test("clustered layout skips row groups a linear sort cannot") {
    val dir = Files.createTempDirectory("graft-zorder")
    val grid = spark.range(0, 256 * 256).select(
      (col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
    // 64 files each (finer stats granularity — range-partitioner sampling
    // makes boundaries approximate, so files must be small relative to
    // the box): linear = sorted by a alone; clustered = Morton order
    grid.repartitionByRange(64, col("a"), col("b"))
      .sortWithinPartitions(col("a"), col("b"))
      .write.parquet(s"$dir/linear")
    ZOrder.clusteredWrite(grid, "a", "b", 64, s"$dir/zorder")

    def box(path: String): DataFrame = spark.read.parquet(path)
      .filter(col("a") < 64 && col("b") < 64)

    val z = box(s"$dir/zorder")
    val lin = box(s"$dir/linear")
    assert(z.count() === 64L * 64 && lin.count() === 64L * 64,
      "layouts must not change results")
    val zRows = scanOutputRows(z)
    val linRows = scanOutputRows(lin)
    // The box is 1/16 of the grid. Linearly-sorted files narrow only the
    // `a` range (1/4 of the files, every b inside: ~16k rows); the Morton
    // layout makes the box one contiguous z-range (~4 of 64 files, ~4-8k
    // rows with sampling slop). 2x is a loose floor for the measured gap.
    assert(zRows * 2 <= linRows,
      s"z-order scan read $zRows rows, linear $linRows — no skipping gain")
    assert(zRows <= 3 * 4096,
      s"z-order scan read $zRows rows for a 4096-row box")
  }
}
