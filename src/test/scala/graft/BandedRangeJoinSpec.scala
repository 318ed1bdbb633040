package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The BandedRangeJoin optimizer rule: a naive `abs(x − y) <= W` inner
  * join must plan as a banded equi-join (no nested loop), produce
  * exactly the brute-force result (negative axes included), and leave
  * joins that already have equi keys untouched.
  */
class BandedRangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leftDf: DataFrame =
    Seq((1L, -17L), (2L, -3L), (3L, 0L), (4L, 4L), (5L, 29L))
      .toDF("lid", "x").repartition(3)

  private def rightDf: DataFrame =
    Seq((10L, -21L), (11L, -4L), (12L, 1L), (13L, 9L), (14L, 30L), (15L, 100L))
      .toDF("rid", "y").repartition(2)

  private def brute(w: Long, strict: Boolean): Set[(Long, Long)] = {
    val l = Seq((1L, -17L), (2L, -3L), (3L, 0L), (4L, 4L), (5L, 29L))
    val r = Seq((10L, -21L), (11L, -4L), (12L, 1L), (13L, 9L), (14L, 30L), (15L, 100L))
    (for {
      (lid, x) <- l; (rid, y) <- r
      d = math.abs(x - y)
      if (strict && d < w) || (!strict && d <= w)
    } yield (lid, rid)).toSet
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("abs-range join is rewritten to a banded equi-join with identical results") {
    val joined = leftDf.join(rightDf, abs(col("x") - col("y")) <= lit(5L))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("__graft_band"), s"rule did not fire:\n$optimized")
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"), s"still a nested loop:\n$physical")
    assert(pairs(joined) === brute(5L, strict = false))
  }

  test("strict < bound keeps strict semantics through the rewrite") {
    val joined = leftDf.join(rightDf, abs(col("x") - col("y")) < lit(5L))
    assert(joined.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    assert(pairs(joined) === brute(5L, strict = true))
  }

  test("a join that already has an equi key is not banded") {
    val l = Seq((1L, 1L, 10L)).toDF("lid", "k", "x")
    val r = Seq((2L, 1L, 12L)).toDF("rid", "k2", "y")
    val joined = l.join(r,
      col("k") === col("k2") && abs(col("x") - col("y")) <= lit(5L))
    assert(!joined.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    assert(joined.count() === 1L)
  }

  test("axes near Long.MinValue band without overflow (no dropped pairs)") {
    val lo = Long.MinValue
    val l = Seq((1L, lo), (2L, lo + 3L), (3L, lo + 100L)).toDF("lid", "x")
    val r = Seq((10L, lo + 1L), (11L, lo + 7L), (12L, lo + 95L)).toDF("rid", "y")
    val joined = l.join(r, abs(col("x") - col("y")) <= lit(5L))
    assert(joined.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    // brute force without the abs(x−y) subtract (it would wrap here):
    // qualifying pairs by exact BigInt distance
    val expected = for {
      (lid, x) <- Seq((1L, lo), (2L, lo + 3L), (3L, lo + 100L))
      (rid, y) <- Seq((10L, lo + 1L), (11L, lo + 7L), (12L, lo + 95L))
      if (BigInt(x) - BigInt(y)).abs <= 5
    } yield (lid, rid)
    assert(pairs(joined) === expected.toSet)
  }

  test("w = 1 is not banded (fan-out would overflow at axis extremes) yet still runs") {
    val l = Seq((1L, Long.MaxValue), (2L, 0L)).toDF("lid", "x")
    val r = Seq((10L, Long.MaxValue - 1L), (11L, 1L)).toDF("rid", "y")
    val joined = l.join(r, abs(col("x") - col("y")) <= lit(1L))
    assert(!joined.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    // the nested-loop plan handles the extreme axis fine; the rewrite
    // would have raised ARITHMETIC_OVERFLOW building band+1 under ANSI
    assert(pairs(joined) === Set((1L, 10L), (2L, 11L)))
  }

  test("nondeterministic join conditions never reach the rule") {
    // The analyzer rejects nondeterministic join conditions before any
    // optimizer rule runs — the rule's cond.deterministic guard is
    // defense-in-depth (e.g. against future analyzer relaxations), not
    // reachable through the public API. This pins the analyzer contract
    // the guard backstops.
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      leftDf.join(rightDf,
        abs(col("x") - col("y")) <= lit(5L) && rand(7) >= lit(0.0))
        .queryExecution.optimizedPlan
    }
    assert(err.getMessage.contains("INVALID_NON_DETERMINISTIC_EXPRESSIONS"))
  }

  test("randomized sweep: rewrite matches brute force for varied widths and axis ranges") {
    val rnd = new scala.util.Random(0xba4dL)
    // one axis regime per trial: mixing min- and max-edge values in one
    // dataset makes abs(x − y) itself overflow under ANSI — BOTH plans
    // raise there (see the rule scaladoc), so such pairs aren't
    // comparable against a BigInt brute force
    for (w <- Seq(2L, 3L, 7L, 41L); regime <- 0 until 3) {
      def axis(): Long = regime match {
        case 0 => rnd.nextLong() % (3 * w) // dense cluster around 0
        case 1 => Long.MinValue + math.abs(rnd.nextLong() % (4 * w))
        case 2 => Long.MaxValue - math.abs(rnd.nextLong() % (4 * w))
      }
      val l = (1L to 12L).map(i => (i, axis()))
      val r = (20L to 34L).map(i => (i, axis()))
      val joined = l.toDF("lid", "x").repartition(3)
        .join(r.toDF("rid", "y").repartition(2),
          abs(col("x") - col("y")) <= lit(w))
      assert(joined.queryExecution.optimizedPlan.toString.contains("__graft_band"),
        s"rule did not fire for w=$w regime=$regime")
      val expected = (for {
        (lid, x) <- l; (rid, y) <- r
        if (BigInt(x) - BigInt(y)).abs <= w
      } yield (lid, rid)).toSet
      assert(pairs(joined) === expected, s"mismatch at w=$w regime=$regime")
    }
  }

  test("outer range joins are left untouched") {
    val joined = leftDf.join(rightDf,
      abs(col("x") - col("y")) <= lit(5L), "left_outer")
    assert(!joined.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    // every left row matches at least once here, so outer ≡ inner result
    assert(pairs(joined) === brute(5L, strict = false))
  }
}
