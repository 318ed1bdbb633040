package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM quantized surprisal, pinned against a plain-Scala
  * reference of the same formula (floor-log2 via bit length — no
  * floating log on either side; the engine-vs-DuckDB diff is
  * oracle_check's job, this pins the semantics).
  */
class LmSurprisalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lm-spec").toString
    rows.map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def flog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)

  private def ref(rows: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val toks = rows.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toList
    }
    val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val big = toks.flatMap { case (_, ws) => ws.zip(ws.drop(1)) }
      .groupBy(identity).view.mapValues(_.size.toLong)
    toks.filter(_._2.size >= 2).map { case (id, ws) =>
      val trans = ws.zip(ws.drop(1))
      id -> (trans.size.toLong,
        trans.map(p => flog2(uni(p._1)) - flog2(big(p))).sum)
    }.toMap
  }

  test("surprisal bits match the reference formula; rare transitions cost more") {
    val rows = Seq[(Long, String)](
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the cat"),
      (3L, "the dog barked"),
      (4L, "cat"),                         // 1 word: no transitions, absent
      (5L, "zz qq zz qq zz"),              // rare words, common internal pairs
      (6L, "the cat zz"))                  // 'cat zz' is a singleton bigram
    val dir = corpusDir(rows)
    val got = graft.queries.DocQueries.qLmSurprisal.run(spark, dir)
      .as[(Long, Long, Long)].collect()
      .map { case (id, t, b) => id -> (t, b) }.toMap
    assert(got == ref(rows))
    assert(!got.contains(4L))
    // doc 6's unique 'cat zz' transition costs flog2(c(cat)) - 0 bits;
    // doc 1's all-common transitions cost less per transition than
    // doc 6's average
    val (t1, b1) = got(1L); val (t6, b6) = got(6L)
    assert(b6 * t1 > b1 * t6)
  }
}
