package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.BpeQueries

/** BPE trainer semantics, pinned three ways: hand-computed merges on a
  * fixed corpus, greedy-rewrite edge cases (overlapping same-symbol
  * runs), and a randomized differential against an independent
  * index-skipping reference (the Spark side is a sequential
  * accumulator fold — a genuinely different formulation of the same
  * greedy pass; the DuckDB oracle's window-parity form is the third,
  * diffed by oracle_check at sf0.01).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- reference implementation (plain Scala, index-skipping) ------ //

  private def refMergeOnce(syms: List[String], l: String,
      r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(wordFreq: Map[String, Long], k: Int)
      : (List[(Int, String, String, String, Long)],
         Map[String, List[String]]) = {
    var vocab: Map[String, List[String]] = wordFreq.keysIterator
      .map(w => w -> (w.toList.map(_.toString) :+ BpeQueries.EndMark)).toMap
    val merges = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (w, syms) =>
        val f = wordFreq(w)
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        // max freq, ties broken by (lhs, rhs) ascending
        val ((l, rr), pf) = counts.toSeq
          .sortBy { case ((a, b), f) => (-f, a, b) }.head
        merges += ((r, l, rr, l + rr, pf))
        vocab = vocab.map { case (w, syms) =>
          w -> refMergeOnce(syms, l, rr)
        }
      }
      r += 1
    }
    (merges.toList, vocab)
  }

  private def sparkTrain(wordFreq: Map[String, Long], k: Int) = {
    val words = wordFreq.toSeq.toDF("w", "freq")
      .select(col("w"), col("freq"),
        concat(
          expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          array(lit(BpeQueries.EndMark))).as("syms"))
    BpeQueries.trainUncached(words, k)
  }

  // ---- fixed examples --------------------------------------------- //

  test("hand-computed merges on a fixed corpus") {
    // "low" x5, "lower" x2, "lowest" x6: 'lo' wins round 1 (13), then
    // 'low' (13); round 3 is the w</w> of the bare "low" (5) vs
    // 'es'/'st'/'t</w>' of "lowest" (6) — 'es' wins on freq, 'est' next
    val wf = Map("low" -> 5L, "lower" -> 2L, "lowest" -> 6L)
    val (merges, vocab) = sparkTrain(wf, 4)
    val (refM, refV) = refTrain(wf, 4)
    assert(merges == refM)
    assert(merges.take(2).map(m => (m._2, m._3)) == Seq(("l", "o"), ("lo", "w")))
    val vmap = vocab.select(col("w"), col("syms")).as[(String, Seq[String])]
      .collect().toMap.map { case (w, s) => w -> s.toList }
    assert(vmap == refV)
  }

  test("greedy same-symbol runs: leftmost pairs win, merged never re-merges") {
    // 'aaaa' under (a,a): [aa, aa]; 'aaa': [aa, a] — the accumulator
    // fold and the reference index-skip must agree exactly
    val wf = Map("aaaa" -> 3L, "aaa" -> 2L)
    val (merges, vocab) = sparkTrain(wf, 1)
    assert(merges.head._2 == "a" && merges.head._3 == "a")
    val vmap = vocab.select(col("w"), col("syms")).as[(String, Seq[String])]
      .collect().toMap
    assert(vmap("aaaa").toList == List("aa", "aa", BpeQueries.EndMark))
    assert(vmap("aaa").toList == List("aa", "a", BpeQueries.EndMark))
  }

  test("pair exhaustion stops the loop early with the learned prefix") {
    // single 1-char word: syms = [a, </w>] — one pair, then nothing
    val (merges, vocab) = sparkTrain(Map("a" -> 7L), 5)
    assert(merges.map(m => (m._1, m._4)) == Seq((1, "a" + BpeQueries.EndMark)))
    assert(vocab.select(col("syms")).as[Seq[String]].collect().head
      == Seq("a" + BpeQueries.EndMark))
  }

  // ---- randomized differential ------------------------------------ //

  test("randomized differential vs the index-skipping reference") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 6) {
      val alphabet = "ab" + ("cdefg".take(rnd.nextInt(4)))
      val nWords = 5 + rnd.nextInt(20)
      val wf = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(7)
        val w = (1 to len)
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        w -> (1L + rnd.nextInt(9))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val k = 2 + rnd.nextInt(9)
      val (merges, vocab) = sparkTrain(wf, k)
      val (refM, refV) = refTrain(wf, k)
      assert(merges == refM, s"trial $trial merges diverged (wf=$wf k=$k)")
      val vmap = vocab.select(col("w"), col("syms"))
        .as[(String, Seq[String])].collect().toMap
        .map { case (w, s) => w -> s.toList }
      assert(vmap == refV, s"trial $trial vocab diverged (wf=$wf k=$k)")
    }
  }
}
