package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorSumAgg

/** The typed element-wise vector-sum aggregator: value-parity with the
  * posexplode/groupBy/sum formulation it replaces, and the edge cases
  * (nulls skipped, dimension mismatch rejected).
  */
class VectorAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vector_sum equals the explode-groupBy-sum formulation") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(300)(i =>
      (i % 7, Seq.fill(16)(rnd.nextInt(2000000).toLong - 1000000)))
    val df = rows.toDF("k", "v")
    val packed = df.groupBy(col("k"))
      .agg(VectorSumAgg(col("v")).as("sv"))
    val exploded = df
      .select(col("k"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("k"), col("pos")).agg(sum(col("x")).as("s"))
      .groupBy(col("k"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, s))), p -> p.s)")
        .as("sv"))
    val mismatches = packed.alias("p")
      .join(exploded.alias("e"), Seq("k"))
      .filter(col("p.sv") =!= col("e.sv"))
      .count()
    assert(mismatches === 0)
  }

  test("null input rows are skipped, not poisoning the sum") {
    val df = Seq((1, Seq(1L, 2L)), (1, Seq(10L, 20L))).toDF("k", "v")
      .union(Seq(1).toDF("k").select(col("k"),
        lit(null).cast("array<bigint>").as("v")))
    val out = df.groupBy("k").agg(VectorSumAgg(col("v")).as("sv"))
      .select("sv").as[Seq[Long]].collect()
    assert(out.toSeq === Seq(Seq(11L, 22L)))
  }

  test("dimension mismatch fails loudly") {
    val df = Seq((1, Seq(1L, 2L)), (1, Seq(1L, 2L, 3L))).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy("k").agg(VectorSumAgg(col("v"))).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("dimension mismatch"))
  }
}
