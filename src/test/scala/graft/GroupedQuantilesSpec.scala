package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GroupedQuantiles
import graft.engine.GroupedQuantiles.Q

/** The histogram-refinement quantiles must agree EXACTLY with the
  * brute-force definition (sort the group, take element at rank
  * ceil(n·num/den)) — on uniform data, heavy skew, negatives straddling
  * bucket boundaries, and bucket widths small enough to force real
  * multi-bucket refinement.
  */
class GroupedQuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val qs = Seq(Q("p05", 5, 100), Q("p50", 50, 100), Q("p95", 95, 100))

  private def bruteForce(rows: Seq[(String, Long)]): Map[(String, String), Long] =
    rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.size.toLong
      qs.map { q =>
        val rank = (n * q.num + q.den - 1) / q.den
        (g, q.out) -> sorted((rank - 1).toInt)
      }
    }

  private def check(rows: Seq[(String, Long)], width: Long): Unit = {
    val df = rows.toDF("grp", "v")
    val got = GroupedQuantiles
      .valueAtRanks(df, Seq("grp"), "v", qs, bucketWidth = width)
      .collect()
      .flatMap(r => qs.map(q => (r.getString(0), q.out) -> r.getAs[Long](q.out)))
      .toMap
    assert(got == bruteForce(rows))
  }

  test("matches brute force on uniform-ish data across groups") {
    val rnd = new scala.util.Random(7)
    val rows = for (g <- Seq("a", "b", "c"); _ <- 1 to 500)
      yield (g, rnd.nextLong() % 100000)
    check(rows, 1L << 8)
  }

  test("heavy skew: one value dominating a group stays one histogram row") {
    val rows = Seq.fill(10000)(("s", 42L)) ++
      (1 to 300).map(i => ("s", i * 1000L)) ++
      (1 to 100).map(i => ("t", i.toLong))
    check(rows, 1L << 4)
  }

  test("negative values bucket correctly (arithmetic shift = floor div)") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 1000).map(_ => ("n", rnd.nextLong() % 500 - 250))
    check(rows, 1L << 3)
  }

  test("tiny width forces refinement across many buckets; ranks at edges") {
    // n=1 group: every quantile is the single element
    val rows = (1 to 997).map(i => ("e", i.toLong * 7)) ++ Seq(("one", 5L))
    check(rows, 2L)
  }

  test("interpolated is bit-identical to Spark's percentile aggregate") {
    val rnd = new scala.util.Random(21)
    val rows = (for (g <- Seq("a", "b"); _ <- 1 to 700)
      yield (g, rnd.nextLong() % 10000)) ++
      Seq.fill(5000)(("skew", 7L)) ++ (1 to 40).map(i => ("skew", i * 13L)) ++
      Seq(("one", -3L))
    val df = rows.toDF("grp", "v")
    val expected = df.groupBy("grp")
      .agg(expr("percentile(v, 0.5d)").as("p50"),
        expr("percentile(v, 0.9d)").as("p90"),
        expr("percentile(v, 1.0d)").as("p100"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val got = GroupedQuantiles.interpolated(df, Seq("grp"), "v",
      Seq("p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0), bucketWidth = 1L << 5)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got == expected) // == on doubles: bit-identical, no tolerance
  }

  /** winsorizedSum must equal the brute force bounds-then-clamp: value
    * at rank ceil(n·5/100) / ceil(n·95/100), then Σ clamp(v) — on
    * uniform data, duplicate-heavy data (copies straddling the bound),
    * negatives, and widths small enough to force real refinement.
    */
  private def checkWinsorized(rows: Seq[(String, Long)], width: Long): Unit = {
    val df = rows.toDF("grp", "v")
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.size.toLong
      def at(num: Long) = sorted(((n * num + 99) / 100 - 1).toInt)
      val (lo, hi) = (at(5), at(95))
      g -> (n, lo, hi, sorted.map(x => math.min(math.max(x, lo), hi)).sum)
    }
    val got = GroupedQuantiles.winsorizedSum(df, Seq("grp"), "v",
      Q("lo", 5, 100), Q("hi", 95, 100), bucketWidth = width)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("lo"), r.getAs[Long]("hi"),
          r.getAs[Long]("wsum"))).toMap
    assert(got == expected)
  }

  test("winsorizedSum matches brute-force clamp on uniform-ish groups") {
    val rnd = new scala.util.Random(31)
    val rows = (for (g <- Seq("a", "b", "c"); _ <- 1 to 600)
      yield (g, rnd.nextLong() % 100000)) ++ Seq(("one", 17L))
    checkWinsorized(rows, 1L << 8)
  }

  test("winsorizedSum: duplicates straddling both bounds, tiny buckets") {
    // heavy mass AT the bound values exercises the strictly-below /
    // strictly-above accounting (copies equal to a bound are unclamped)
    val rows = Seq.fill(400)(("d", 100L)) ++ Seq.fill(300)(("d", 500L)) ++
      Seq.fill(400)(("d", 900L)) ++ (1 to 50).map(i => ("d", i * 37L)) ++
      (1 to 1000).map(i => ("n", i.toLong - 500))
    checkWinsorized(rows, 1L << 3)
  }

  test("rejects non-power-of-two widths and bad fractions") {
    val df = Seq(("a", 1L)).toDF("grp", "v")
    intercept[IllegalArgumentException] {
      GroupedQuantiles.valueAtRanks(df, Seq("grp"), "v", qs, bucketWidth = 100)
    }
    intercept[IllegalArgumentException] { Q("bad", 0, 100) }
    intercept[IllegalArgumentException] { Q("bad", 101, 100) }
  }
}
