package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.FrontierQueries

/** The decomposed skyline (group-min + exclusive prefix-min) must equal
  * the textbook all-pairs dominance definition on geometries that
  * exercise every tie case: duplicate points, same-price different
  * sizes, same-size different prices, and a staircase frontier.
  */
class FrontierQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def partDir(rows: Seq[(Long, Int, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("frontier_part").toString
    val schema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType)))
    val data = rows.map { case (k, size, price) =>
      Row(k, s"part$k", "b", "t", size, price)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 3), schema)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    dir
  }

  /** Textbook dominance: q beats p iff ≤ on both axes, < on one. */
  private def bruteSkyline(
      rows: Seq[(Long, Int, Double)]): Set[Long] =
    rows.filter { case (_, ps, pp) =>
      !rows.exists { case (_, qs, qp) =>
        qp <= pp && qs <= ps && (qp < pp || qs < ps)
      }
    }.map(_._1).toSet

  private def run(rows: Seq[(Long, Int, Double)]): Set[Long] =
    FrontierQueries.qSkyline.run(spark, partDir(rows))
      .collect().map(_.getLong(0)).toSet

  test("staircase with duplicates and both tie axes") {
    val rows = Seq(
      (1L, 5, 1.0), (2L, 5, 1.0),  // duplicate frontier point — both kept
      (3L, 7, 1.0),                // same price, worse size — dominated
      (4L, 4, 2.0),                // frontier (cheaper ones are larger)
      (5L, 5, 2.0),                // same size as 1 at higher price — out
      (6L, 3, 3.0),                // frontier
      (7L, 4, 3.0),                // ties size 4 at higher price — out
      (8L, 9, 0.5),                // frontier (cheapest overall)
      (9L, 3, 4.0))                // ties size 3 at higher price — out
    assert(run(rows) === bruteSkyline(rows))
    assert(run(rows) === Set(1L, 2L, 4L, 6L, 8L))
  }

  test("single row and all-identical rows are whole frontiers") {
    val one = Seq((1L, 4, 2.0))
    assert(run(one) === Set(1L))
    val same = Seq((1L, 4, 2.0), (2L, 4, 2.0), (3L, 4, 2.0))
    assert(run(same) === Set(1L, 2L, 3L))
  }

  test("strictly improving staircase keeps everything") {
    val rows = (1L to 6L).map(i => (i, 10 - i.toInt, i.toDouble))
    assert(run(rows) === bruteSkyline(rows))
    assert(run(rows).size === 6)
  }

  test("random cloud matches brute force") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(i =>
      (i, rnd.nextInt(30), (rnd.nextInt(500) + 1) / 100.0))
    assert(run(rows) === bruteSkyline(rows))
  }
}
