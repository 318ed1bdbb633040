package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (SURVEY §5) of the pure computational kernels
  * the oracle-checked plans are built from — hundreds of generated
  * cases (including Long-extreme regions) where the example-based specs
  * pin single values. Raw ScalaCheck (no scalatestplus bridge in the
  * offline cache): each property is checked explicitly and the result
  * asserted.
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop, n: Int = 300): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  private val anyLong: Gen[Long] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue),
    Gen.choose(Long.MinValue, Long.MinValue + 1000L),
    Gen.choose(Long.MaxValue - 1000L, Long.MaxValue),
    Gen.choose(-1000000L, 1000000L))

  test("BandedRangeJoin.floorDiv equals Math.floorDiv for every long") {
    check(Prop.forAll(anyLong, Gen.choose(1L, 1000000L)) { (a, w) =>
      val e = graft.plans.BandedRangeJoin.floorDiv(Literal(a, LongType), w)
      e.eval(InternalRow.empty) == Math.floorDiv(a, w)
    })
  }

  test("banding soundness: |x-y| <= w implies bands within 1") {
    // the invariant the rewrite's correctness rests on, for pairs whose
    // difference does not overflow (the rule's documented scope)
    val cases = for {
      x <- anyLong
      w <- Gen.choose(1L, 1000000L)
      d <- Gen.choose(-w, w) if (BigInt(x) + BigInt(d)).isValidLong
    } yield (x, x + d, w)
    check(Prop.forAll(cases) { case (x, y, w) =>
      math.abs(Math.floorDiv(x, w) - Math.floorDiv(y, w)) <= 1
    })
  }

  test("LongArrayDot.dotOrNull equals BigInt dot for bounded vectors") {
    val vec = Gen.listOfN(16, Gen.choose(-1000000L, 1000000L))
    check(Prop.forAll(vec, vec) { (a, b) =>
      val got = graft.functions.LongArrayDot.dotOrNull(
        new GenericArrayData(a.toArray),
        new GenericArrayData(b.toArray))
      val want = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      want.isValidLong && got == want.toLong
    })
  }

  test("Md5Prefix44.hash equals the hex-prefix radix parse for any string") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val bytes = s.getBytes("UTF-8")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString.take(11)
      graft.functions.Md5Prefix44.hash(bytes) ==
        java.lang.Long.parseLong(hex, 16)
    })
  }

  test("divRoundHalfUp matches BigDecimal HALF_UP on generated pairs") {
    // one Spark job over a generated batch (per-case jobs would be
    // minutes of overhead for the same coverage)
    val pairs = Gen.listOfN(500,
      Gen.zip(Gen.choose(0L, 1000000000L), Gen.choose(1L, 1000000L)))
      .sample.get
    val got = pairs.toDF("p", "q")
      .select(graft.queries.QueryDef.divRoundHalfUp(col("p"), col("q")))
      .as[Long].collect().toSeq
    val want = pairs.map { case (p, q) =>
      BigDecimal(p).bigDecimal
        .divide(BigDecimal(q).bigDecimal, 0, java.math.RoundingMode.HALF_UP)
        .longValueExact()
    }
    assert(got === want)
  }

  test("mask spans never overlap and are reproducible across runs") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.TrainingQueries.qMaskSpans
    val run1 = q.run(spark, dir)
      .select("doc_id", "span_start").as[(Long, Long)].collect().sorted
    assert(run1.nonEmpty)
    // stride-20 phase starts with span length 3: consecutive starts in
    // a doc must be >= 20 apart (non-overlap is by construction; this
    // pins it against future stride/span edits)
    run1.groupBy(_._1).values.foreach { spans =>
      val starts = spans.map(_._2).sorted
      starts.sliding(2).foreach {
        case Array(a, b) => assert(b - a >= 20L)
        case _ =>
      }
    }
    val run2 = q.run(spark, dir)
      .select("doc_id", "span_start").as[(Long, Long)].collect().sorted
    assert(run1 === run2, "masking plan must be bit-reproducible")
  }
}
