package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Md5Prefix44, TextFunctions}

/** The native Md5Prefix44 expression must be value-identical to the
  * built-in conv(substring(md5)) chain it replaces (the DuckDB oracle
  * derives from the same hex definition).
  */
class TextHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample: Seq[String] = {
    val rnd = new scala.util.Random(7)
    Seq("", "a", "The quick brown fox", "héllo wörld", "日本語テキスト",
      "x" * 1000) ++
      (0 until 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(30)).mkString)
  }

  test("native h44 equals the built-in hex formulation on varied inputs") {
    val df = sample.toDF("s")
      .select(TextFunctions.h44(col("s")).as("native"),
        TextFunctions.h44Builtin(col("s")).as("builtin"))
    assert(df.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("native h44 works inside higher-order-function lambdas") {
    val df = Seq(Seq("a", "b", "c")).toDF("ws")
      .select(transform(col("ws"), w => TextFunctions.h44(w)).as("native"),
        transform(col("ws"), w => TextFunctions.h44Builtin(w)).as("builtin"))
    val r = df.as[(Seq[Long], Seq[Long])].collect().head
    assert(r._1 === r._2)
  }

  test("md5_prefix44 is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT md5_prefix44('abc') AS native, " +
        "cast(conv(substring(md5('abc'), 1, 11), 16, 10) as bigint) AS builtin")
      .as[(Long, Long)].collect().head
    assert(r._1 === r._2)
  }

  test("native long_array_dot equals the HOF aggregate/zip_with formulation") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextInt(2000000).toLong - 1000000),
      Seq.fill(64)(rnd.nextInt(2000000).toLong - 1000000)))
    val df = rows.toDF("a", "b")
      .select(
        graft.functions.LongArrayDot(col("a"), col("b")).as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("native minhash_agree equals the HOF CASE-count formulation, " +
      "nulls and length mismatch included") {
    val rnd = new scala.util.Random(17)
    // small value range forces frequent agreements; sprinkle nulls and
    // a few short arrays to hit the padding semantics
    def arr(): Seq[java.lang.Long] = Seq.fill(if (rnd.nextInt(10) == 0) 8 else 12)(
      if (rnd.nextInt(12) == 0) null
      else java.lang.Long.valueOf(rnd.nextInt(4).toLong))
    val rows = Seq.fill(300)((arr(), arr()))
    val df = rows.toDF("sa", "sb")
      .select(
        graft.functions.MinHashAgree(col("sa"), col("sb")).as("native"),
        expr("aggregate(zip_with(sa, sb, (x, y) -> CASE WHEN x = y THEN 1 " +
          "ELSE 0 END), 0, (acc, v) -> acc + v)").as("hof"))
    assert(df.filter(not(col("native") <=> col("hof"))).count() === 0)
    // NULL array propagates, as the HOF chain's zip_with(null, ...) does
    val nulls = Seq((null: Seq[java.lang.Long], Seq[java.lang.Long](1L, 2L)))
      .toDF("sa", "sb")
      .select(graft.functions.MinHashAgree(col("sa"), col("sb")).as("native"))
    assert(nulls.head.isNullAt(0))
  }

  test("long_array_dot nulls out on null elements, matching the HOF chain") {
    val df = Seq(
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)))
      .toDF("a", "b")
      .select(
        graft.functions.LongArrayDot(col("a"), col("b")).as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("hof"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getLong(0) === 11L && rows(1).getLong(1) === 11L)
  }

  test("long_array_dot nulls out on length mismatch, matching the HOF chain") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L)),
      (Seq(1L, 2L), Seq(4L, 5L, 6L)))
      .toDF("a", "b")
      .select(
        graft.functions.LongArrayDot(col("a"), col("b")).as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("hof"))
    df.collect().foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("registered functions reject wrong arity with a clear analysis error") {
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT md5_prefix44()").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("md5_prefix44"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT long_array_dot(array(1L))").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("long_array_dot"))
  }

  test("long_array_dot rejects non-bigint arrays at analysis time") {
    val err = intercept[Exception] {
      Seq((Seq(1.0, 2.0), Seq(1L, 2L))).toDF("a", "b")
        .select(graft.functions.LongArrayDot(col("a"), col("b")))
        .collect()
    }
    assert(err.getMessage.contains("array<bigint>") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("scala-side hash matches the engine evaluation") {
    val engine = Seq("plane_0_dim_0").toDF("s")
      .select(TextFunctions.h44(col("s"))).as[Long].collect().head
    assert(engine === Md5Prefix44.hash("plane_0_dim_0".getBytes("UTF-8")))
  }

  test("word_shingles is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT word_shingles(array('a','b','c','b','c'), 2) AS s")
      .as[Seq[String]].collect().head
    assert(r === Seq("a b", "b c", "c b"))
  }

  test("native word_shingles equals the HOF chain, order included") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ffff", "gg", "hij")
    val cases: Seq[Seq[String]] =
      Seq(Seq.empty[String], Seq("solo"), Seq("x", "y"), Seq("x", "y", "z"),
        Seq("r", "r", "r", "r", "r")) ++
        (0 until 200).map(_ =>
          (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size))))
    for (n <- Seq(2, 3, 8)) {
      // call sites guard size(ws) >= n before the HOF chain (slice
      // errors on a descending sequence otherwise); mirror that here
      val hof = when(size(col("ws")) >= n,
        array_distinct(transform(
          sequence(lit(1), size(col("ws")) - (n - 1)),
          i => array_join(slice(col("ws"), i, lit(n)), " "))))
        .otherwise(array().cast("array<string>"))
      val df = cases.toDF("ws").select(
        graft.functions.WordShingles(col("ws"), n).as("native"),
        hof.as("hof"))
      assert(df.filter(not(col("native") <=> col("hof"))).count() === 0,
        s"mismatch at n=$n")
    }
  }

  test("native span_hashes equals the HOF chain, one hash per position") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ffff", "gg", "hij")
    val cases: Seq[Seq[String]] =
      Seq(Seq.empty[String], Seq("solo"), Seq("x", "y"), Seq("x", "y", "z"),
        Seq("r", "r", "r", "r", "r")) ++
        (0 until 200).map(_ =>
          (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size))))
    for (n <- Seq(2, 3, 8)) {
      val hof = when(size(col("ws")) >= n,
        transform(sequence(lit(0), size(col("ws")) - n),
          i => TextFunctions.h44(array_join(slice(col("ws"), i + 1, lit(n)), " "))))
        .otherwise(array().cast("array<bigint>"))
      val df = cases.toDF("ws").select(
        graft.functions.SpanHashes(col("ws"), n).as("native"),
        hof.as("hof"))
      assert(df.filter(not(col("native") <=> col("hof"))).count() === 0,
        s"mismatch at n=$n")
    }
  }

  test("span_hashes keeps duplicate spans positionally, unlike word_shingles") {
    val r = Seq(Seq("a", "b", "a", "b", "a")).toDF("ws")
      .select(graft.functions.SpanHashes(col("ws"), 2).as("sh"),
        size(graft.functions.WordShingles(col("ws"), 2)).as("distinct_n"))
      .as[(Seq[Long], Int)].collect().head
    assert(r._1.length === 4)
    assert(r._1(0) === r._1(2)) // "a b" at positions 0 and 2
    assert(r._1(1) === r._1(3)) // "b a" at positions 1 and 3
    assert(r._2 === 2)
  }

  test("span_hashes is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT span_hashes(array('a','b','c'), 2) AS s")
      .as[Seq[Long]].collect().head
    val twin = Seq(("a b", "b c")).toDF("g1", "g2")
      .select(TextFunctions.h44(col("g1")), TextFunctions.h44(col("g2")))
      .as[(Long, Long)].collect().head
    assert(r === Seq(twin._1, twin._2))
  }

  test("native simhash32 equals the HOF chain on varied hash arrays") {
    val rnd = new scala.util.Random(23)
    val cases: Seq[Seq[Long]] =
      Seq(Seq.empty[Long], Seq(0L), Seq((1L << 44) - 1),
        Seq(0L, (1L << 44) - 1)) ++
        (0 until 300).map(_ =>
          Seq.fill(rnd.nextInt(60))(math.abs(rnd.nextLong()) % (1L << 44)))
    val df = cases.toDF("hs").select(
      TextFunctions.simhash32("hs").as("native"),
      TextFunctions.simhash32Builtin("hs").as("hof"))
    assert(df.filter(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("simhash32 mirrors the HOF chain's null-element poisoning (0)") {
    val df = Seq(Seq[java.lang.Long](5L, null, 9L))
      .toDF("hs").select(
        TextFunctions.simhash32("hs").as("native"),
        TextFunctions.simhash32Builtin("hs").as("hof"))
    val r = df.as[(Long, Long)].collect().head
    assert(r._1 === r._2)
    assert(r._1 === 0L)
  }

  test("simhash32 is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT simhash32(array(1L, 2L, 4L)) AS s").as[Long].collect().head
    val twin = Seq(Seq(1L, 2L, 4L)).toDF("hs")
      .select(TextFunctions.simhash32Builtin("hs")).as[Long].collect().head
    assert(r === twin)
  }

  test("native minhash_sig equals the HOF chain on varied word arrays") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliett")
    val cases: Seq[Seq[String]] =
      Seq(Seq.empty[String], Seq("solo"), Seq("dup", "dup", "dup")) ++
        (0 until 200).map(_ =>
          (0 until rnd.nextInt(50)).map(_ => vocab(rnd.nextInt(vocab.size))))
    val df = cases.toDF("ws").select(
      TextFunctions.minhashSig(col("ws")).as("native"),
      TextFunctions.minhashSigBuiltin(col("ws")).as("hof"))
    assert(df.filter(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("minhash_sig skips null words and nulls out on empty, like the HOF") {
    val df = Seq(
      Seq[String]("a", null, "b"),
      Seq[String](null, null),
      Seq.empty[String])
      .toDF("ws").select(
        TextFunctions.minhashSig(col("ws")).as("native"),
        TextFunctions.minhashSigBuiltin(col("ws")).as("hof"))
    assert(df.filter(not(col("native") <=> col("hof"))).count() === 0)
  }

  test("minhash_sig is callable from SQL via GraftExtensions") {
    val r = spark.sql("SELECT minhash_sig(array('x', 'y')) AS s")
      .as[Seq[java.lang.Long]].collect().head
    val twin = Seq(Seq("x", "y")).toDF("ws")
      .select(TextFunctions.minhashSigBuiltin(col("ws")))
      .as[Seq[java.lang.Long]].collect().head
    assert(r === twin)
  }
}
