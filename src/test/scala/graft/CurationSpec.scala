package graft

import org.scalatest.funsuite.AnyFunSuite

/** Authored edge cases for the curation operators: decontamination
  * thresholding, PII redaction byte-exactness, weighted-sample
  * determinism and weight semantics.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-curation-spec").toString
    rows.map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("decontaminate reports pairs with >= 2 shared trigrams only") {
    val dir = docsDir(Seq(
      // doc 0: eval (0 % 97 == 0)
      (0L, "the quick brown fox jumps over the lazy dog"),
      // doc 1: shares trigrams "the quick brown", "quick brown fox" -> reported
      (1L, "see the quick brown fox run"),
      // doc 2: shares exactly one trigram ("over the lazy") -> filtered out
      (2L, "falling over the lazy afternoon haze today"),
      // doc 3: disjoint vocabulary -> no candidate pair at all
      (3L, "completely unrelated words appear here instead now")))
    val got = graft.queries.CurationQueries.qDecontaminate.run(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    assert(got === List((1L, 0L, 2L)))
  }

  test("pii redaction counts and redacted text are byte-exact") {
    val dir = docsDir(Seq(
      (0L, "plain text with no contact info"),
      // an email already in the body -> 2 emails after the appended one
      (1L, "reach me at alice@test.org for details")))
    val got = graft.queries.CurationQueries.qPiiRedact.run(spark, dir)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

    val expected0 = md5hex(
      "plain text with no contact info Contact <EMAIL> or <PHONE>.")
    val expected1 = md5hex(
      "reach me at <EMAIL> for details Contact <EMAIL> or <PHONE>.")
    assert(got(0L) === ((1L, 1L, expected0)))
    assert(got(1L) === ((2L, 1L, expected1)))
  }

  test("weighted sample accepts every doc at weight >= cap and is deterministic") {
    // n_chars = text.length; build one doc far above the 1000-char cap
    // (p = 1, must always be accepted) and many tiny ones (p small).
    val big = (10L, "x" * 2000)
    val small = (0L until 50L).filter(_ != 10L).map(i => (i, s"tiny doc $i"))
    val dir = docsDir(small :+ big)
    val run1 = graft.queries.CurationQueries.qWeightedSample.run(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    val run2 = graft.queries.CurationQueries.qWeightedSample.run(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    assert(run1 === run2)
    assert(run1.exists(_._1 == 10L), "p=1 doc must always be sampled")
    // accept decision must match the integer predicate exactly
    run1.foreach { case (_, nChars, u20) =>
      assert(u20 * 1000 < nChars * (1L << 20))
    }
  }

  test("leakproof split co-assigns every near-dup pair; naive id split leaks") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = graft.queries.DocQueries.minhashCandidates(d)
      .filter(col("matches") >= MinhashK - 1)
      .select(col("doc_a"), col("doc_b"))
    assert(pairs.count() > 0, "corpus must contain near-dup pairs")

    def split(key: Column): Column = {
      val h = h44(key.cast("string")) % 100
      when(h < 80, "train").when(h < 90, "val").otherwise("test")
    }
    def leaks(assign: org.apache.spark.sql.DataFrame): Long = pairs
      .join(assign.select(col("doc_id").as("doc_a"), col("split").as("sa")),
        Seq("doc_a"))
      .join(assign.select(col("doc_id").as("doc_b"), col("split").as("sb")),
        Seq("doc_b"))
      .filter(col("sa") =!= col("sb")).count()

    val grouped = d.select(col("doc_id"))
      .join(graft.queries.DocQueries.dupGroups(d), Seq("doc_id"), "left")
      .select(col("doc_id"),
        split(coalesce(col("dup_group"), col("doc_id"))).as("split"))
    assert(leaks(grouped) === 0L,
      "groupwise split must never place a near-dup pair across splits")

    val naive = d.select(col("doc_id"), split(col("doc_id")).as("split"))
    assert(leaks(naive) > 0L,
      "the id-hash split leaks near-dups on this corpus (the operator's point)")
  }

  test("dup-groups cache: two different corpora in one session never collide") {
    import org.apache.spark.sql.functions.col
    // Same schema, same row count, different content — if the cache
    // keyed on anything weaker than the canonicalized input plan (or
    // normalized away the file listing), corpus B would be served
    // corpus A's components.
    val longA = Array.fill(40)("alpha shared phrase tokens").mkString(" ")
    val longB = Array.fill(40)("beta other corpus wording").mkString(" ")
    val dirA = docsDir(Seq(
      (0L, longA), (1L, longA), (2L, "unrelated filler words only")))
    val dirB = docsDir(Seq(
      (5L, longB), (6L, longB), (7L, "more unrelated filler text")))
    def groups(dir: String): Set[(Long, Long)] =
      graft.queries.DocQueries.dupGroups(
        spark.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), col("dup_group"))
        .as[(Long, Long)].collect().toSet
    assert(groups(dirA) === Set((0L, 0L), (1L, 0L)))
    assert(groups(dirB) === Set((5L, 5L), (6L, 5L)))
  }

  test("the materialized shingle relation does not inherit the input's " +
      "split count (round-7 single-row-group layout lesson)") {
    // one tiny parquet file = one scan split; the cached relation must
    // still come out at the engine's shuffle width, not frozen at 1
    val dir = docsDir((0L to 40L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta token$i run")))
    val grams = graft.queries.HashedGrams(spark, dir, 3)
    assert(grams.rdd.getNumPartitions ===
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
  }
}
