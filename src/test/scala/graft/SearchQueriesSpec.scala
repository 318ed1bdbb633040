package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Authored edge cases for the retrieval + robust-stats operators:
  * BM25 ordering semantics, posting-list truncation, spine denseness,
  * MAD outlier gating, exact-k sampling — the properties the DuckDB
  * hash check asserts only in bulk.
  */
class SearchQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-search-spec").toString
    rows.map { case (id, text, lang) =>
      (id, text, lang, "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def eventsDir(
      rows: Seq[(Long, Timestamp, Long, String, Double)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-search-spec-ev").toString
    rows.toDF("event_id", "tts", "user_id", "event_type", "value")
      .withColumn("ts", expr("unix_micros(tts) * 1000L")).drop("tts")
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("bm25 score rises with tf and falls with df at fixed length") {
    // All docs the same length; "vector" appears in 1 doc, "join" in 3.
    val dir = docsDir(Seq(
      (0L, "join alpha beta gamma delta epsilon", "en"),
      (1L, "join join beta gamma delta epsilon", "en"),
      (2L, "join vector beta gamma delta epsilon", "en"),
      (3L, "zeta eta theta iota kappa lambda", "en")))
    val got = graft.queries.SearchQueries.qBm25.run(spark, dir)
      .select("term", "doc_id", "bm25_odds").as[(String, Long, Double)]
      .collect().map { case (t, d, s) => (t, d) -> s }.toMap
    // tf monotonicity: doc 1 has tf=2 for "join", docs 0/2 have tf=1.
    assert(got(("join", 1L)) > got(("join", 0L)))
    // rarity: "vector" (df=1) outscores "join" (df=3) at equal tf/len.
    assert(got(("vector", 2L)) > got(("join", 2L)))
    // absent docs don't appear
    assert(!got.contains(("join", 3L)))
  }

  test("inverted index truncates postings at 10 but df/total_tf stay exact") {
    // "join" in 12 docs (ids 0..11), twice in doc 0 -> df=12, tf=13.
    val dir = docsDir((0L to 11L).map(i =>
      (i, if (i == 0) "join join filler" else "join filler", "en")))
    val row = graft.queries.SearchQueries.qInvertedIndex.run(spark, dir)
      .filter(col("term") === "join")
      .as[(String, Long, Long, String)].collect().head
    assert(row._2 === 12L)
    assert(row._3 === 13L)
    assert(row._4 === (0L to 9L).mkString(","))
  }

  test("inverted index and reservoir sample plan map-side WindowGroupLimit") {
    val dir = docsDir(Seq((0L, "join alpha", "en"), (1L, "join beta", "fr")))
    for (q <- Seq(graft.queries.SearchQueries.qInvertedIndex,
        graft.queries.CurationQueries.qReservoirSample)) {
      val p = q.run(spark, dir).queryExecution.optimizedPlan.toString
      assert(p.contains("WindowGroupLimit"),
        s"${q.name}: no WindowGroupLimit in:\n$p")
    }
  }

  test("gap fill densifies each user's span and zero-fills silent hours") {
    def t(s: String) = Timestamp.valueOf(s)
    val dir = eventsDir(Seq(
      // user 1: active hours 10 and 13 -> spine 10,11,12,13 with 0s between
      (1L, t("2024-05-01 10:15:00"), 1L, "click", 1.0),
      (2L, t("2024-05-01 10:45:00"), 1L, "click", 1.0),
      (3L, t("2024-05-01 13:05:00"), 1L, "view", 1.0),
      // user 2: single hour -> one-row spine
      (4L, t("2024-05-01 09:00:00"), 2L, "click", 1.0),
      // user 25: outside the user_id < 20 demo scope
      (5L, t("2024-05-01 09:00:00"), 25L, "click", 1.0)))
    val got = graft.queries.EventQueries.qGapFill.run(spark, dir)
      .as[(Long, Long, Long)].collect().toList
    val byUser = got.groupBy(_._1)
    assert(byUser(1L).map(_._3) === List(2L, 0L, 0L, 1L))
    assert(byUser(1L).map(_._2) === (byUser(1L).head._2 to
      byUser(1L).head._2 + 3).toList)
    assert(byUser(2L).map(_._3) === List(1L))
    assert(!byUser.contains(25L))
  }

  test("mad outliers: discrete lower median, 3-MAD gate, robust to the outlier itself") {
    def t(s: String) = Timestamp.valueOf(s)
    // values 1,2,3,4,100: lower median 3.00, deviations 2,1,0,1,97 ->
    // MAD (lower median of 0,1,1,2,97) = 1 -> outliers: |v-3| > 3 -> 100 only.
    val dir = eventsDir(Seq(
      (1L, t("2024-05-01 10:00:00"), 1L, "buy", 1.0),
      (2L, t("2024-05-01 10:01:00"), 1L, "buy", 2.0),
      (3L, t("2024-05-01 10:02:00"), 1L, "buy", 3.0),
      (4L, t("2024-05-01 10:03:00"), 1L, "buy", 4.0),
      (5L, t("2024-05-01 10:04:00"), 1L, "buy", 100.0)))
    val got = graft.queries.EventQueries.qMadOutliers.run(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got === (("buy", 300L, 100L, 1L, 9700L)))
  }

  test("setsim prefix filtering finds exactly the brute-force >= 0.6 pairs") {
    // 8 words -> 6 trigrams per doc.
    // docs 0/1: words 4 AND 8 differ -> only trigram starts {1, 5}
    //   survive: J = 2/10 = 0.2 -> below threshold.
    // docs 2/3: identical text -> J = 1.0 -> reported.
    // docs 4/5: first word differs -> only the start-1 trigram dies:
    //   J = 5/7 ≈ 0.714 -> reported. doc 6 unrelated.
    val texts = Seq(
      0L -> "alpha beta gamma delta epsilon zeta eta theta",
      1L -> "alpha beta gamma dolto epsilon zeta eta iota",
      2L -> "one two three four five six seven eight",
      3L -> "one two three four five six seven eight",
      4L -> "red orange yellow green blue indigo violet pink",
      5L -> "mud orange yellow green blue indigo violet pink",
      6L -> "totally different words in this document here now")
    val dir = docsDir(texts.map { case (i, t) => (i, t, "en") })
    val got = graft.queries.SearchQueries.qSetsimJoin.run(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // brute-force ground truth over distinct trigram sets
    def tris(t: String) =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expect = (for {
      (a, ta) <- texts; (b, tb) <- texts if a < b
      i = tris(ta).intersect(tris(tb)).size
      u = tris(ta).union(tris(tb)).size
      if i * 5 >= u * 3
    } yield (a, b)).toSet
    assert(got === expect)
    assert(got === Set((2L, 3L), (4L, 5L)))
    // the token-count verification form must be row-identical to the
    // array form — same candidates, same integer threshold, same ratio
    val arr = graft.queries.SearchQueries.qSetsimJoin.run(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSet
    val cnt = graft.queries.SearchQueries.qSetsimJoinCounts.run(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(arr === cnt)
  }

  test("setsim verification regime: auto picks array under the token " +
      "cap, counts above it, and both configs emit identical rows") {
    val texts = Seq(
      0L -> "one two three four five six seven eight",
      1L -> "one two three four five six seven eight",
      2L -> "red orange yellow green blue indigo violet pink",
      3L -> "mud orange yellow green blue indigo violet pink")
    val dir = docsDir(texts.map { case (i, t) => (i, t, "en") })
    import graft.queries.SearchQueries.{chosenVerification, qSetsimJoin}
    def run() = qSetsimJoin.run(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSet
    try {
      // default auto: 6 distinct trigrams/doc is far under the cap
      assert(chosenVerification(spark, dir) === "array")
      val viaArray = run()
      // drop the cap below the corpus max -> auto flips to counts
      spark.conf.set("graft.setsim.arrayMaxTokens", "5")
      assert(chosenVerification(spark, dir) === "counts")
      assert(run() === viaArray)
      // explicit pins override the probe entirely
      spark.conf.set("graft.setsim.verification", "array")
      assert(chosenVerification(spark, dir) === "array")
      spark.conf.set("graft.setsim.verification", "counts")
      assert(chosenVerification(spark, dir) === "counts")
      assert(run() === viaArray)
      spark.conf.set("graft.setsim.verification", "typo")
      intercept[IllegalArgumentException](chosenVerification(spark, dir))
    } finally {
      spark.conf.unset("graft.setsim.verification")
      spark.conf.unset("graft.setsim.arrayMaxTokens")
    }
  }

  test("welch t-test matches the hand computation on authored variants") {
    def t(s: String) = Timestamp.valueOf(s)
    // A (even user_id): 10.00, 12.00 -> mean 1100c, s² = 20000c²
    // B (odd user_id):  20.00, 22.00 -> mean 2100c, s² = 20000c²
    // t = -1000 / sqrt(10000 + 10000) = -7.0710678…, df = 2
    val dir = eventsDir(Seq(
      (1L, t("2024-05-01 10:00:00"), 2L, "purchase", 10.0),
      (2L, t("2024-05-01 10:01:00"), 4L, "purchase", 12.0),
      (3L, t("2024-05-01 10:02:00"), 1L, "purchase", 20.0),
      (4L, t("2024-05-01 10:03:00"), 3L, "purchase", 22.0),
      (5L, t("2024-05-01 10:04:00"), 1L, "click", 999.0)))
    val r = graft.queries.EventQueries.qAbTtest.run(spark, dir)
      .as[(Long, Long, Double, Double, Double, Double, Double)].collect().head
    assert(r._1 === 2L && r._2 === 2L)
    assert(r._3 === 11.0 && r._4 === 21.0 && r._5 === -10.0)
    assert(math.abs(r._6 - (-1000.0 / math.sqrt(20000.0))) < 1e-12)
    assert(math.abs(r._7 - 2.0) < 1e-12)
  }

  test("pq codes: centroid vectors code to themselves with zero distortion") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-search-spec-emb").toString
    // 10 unit-ish vectors, dim 64; vec 9 duplicates centroid 3 exactly.
    val vecs = (0L to 9L).map { i =>
      val src = if (i == 9L) 3L else i
      (i, (0 until 64).map(j =>
        (((src * 64 + j) % 13).toFloat - 6.0f) / 10.0f).toArray, 0)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.queries.VectorQueries.qPqCodes.run(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    // every centroid subvector is its own nearest centroid, d2 = 0
    for (c <- 0L to 7L; m <- 0L to 3L) {
      val row = got.find(r => r._1 == c && r._2 == m).get
      assert(row._3 === c, s"centroid $c subspace $m coded to ${row._3}")
      assert(row._4 === 0L)
    }
    // the duplicate of centroid 3 codes to 3 with zero distortion
    assert(got.filter(_._1 == 9L).map(r => (r._3, r._4)).toSet === Set((3L, 0L)))
    // 10 vectors × 4 subspaces, exactly one code each
    assert(got.length === 40)
  }

  test("ts similarity ranks the identical series first and skips disjoint pairs") {
    def t(s: String) = Timestamp.valueOf(s)
    // users 1 and 2: identical hourly vectors -> d2 = 0, mutual rank 1.
    // user 3: same hours, different counts -> d2 > 0 vs both.
    // user 4: active ONLY in a disjoint hour -> shares no coordinate
    //   with anyone, so it is no candidate and appears nowhere.
    val base = Seq(
      (1L, "2024-05-01 10:05:00"), (2L, "2024-05-01 10:10:00"),
      (3L, "2024-05-01 10:20:00"))
    val rows =
      base.zipWithIndex.map { case ((u, ts), i) =>
        ((i + 1).toLong, t(ts), u, "click", 1.0) } ++ Seq(
        (10L, t("2024-05-01 11:00:00"), 3L, "click", 1.0),
        (11L, t("2024-05-01 23:00:00"), 4L, "click", 1.0))
    val got = graft.queries.EventQueries.qTsSimilarity
      .run(spark, eventsDir(rows))
      .as[(Long, Long, Long, Long)].collect().toList
    val top = got.filter(_._2 == 1L).map(r => r._1 -> (r._3, r._4)).toMap
    assert(top(1L) === ((2L, 0L)))
    assert(top(2L) === ((1L, 0L)))
    // user 3: vector (10h:1, 11h:1); vs user 1 (10h:1): d2 = 2+1-2 = 1
    assert(top(3L) === ((1L, 1L)))
    assert(!got.exists(r => r._1 == 4L || r._3 == 4L))
  }

  test("reservoir sample returns exactly min(k, group size) rows, deterministically") {
    val dir = docsDir(
      (0L to 19L).map(i => (i, s"doc number $i", "en")) ++
        Seq((100L, "lone french doc", "fr")))
    val q = graft.queries.CurationQueries.qReservoirSample
    val first = q.run(spark, dir).as[(String, Long, Long)].collect().toList
    val again = q.run(spark, dir).as[(String, Long, Long)].collect().toList
    assert(first === again)
    assert(first.count(_._1 == "en") === 5)
    assert(first.filter(_._1 == "fr") === List(("fr", 1L, 100L)))
    assert(first.filter(_._1 == "en").map(_._2) === (1L to 5L).toList)
  }
}
