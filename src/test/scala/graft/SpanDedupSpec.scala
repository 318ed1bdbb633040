package graft

import org.scalatest.funsuite.AnyFunSuite

/** Authored edge cases for exact substring-span dedup (q_span_dedup):
  * canonical (first-occurrence) preservation, cross-document and
  * within-document span removal, whole-document masking.
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-spandedup-spec").toString
    rows.map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): List[(Long, Long, Long, String)] =
    graft.queries.DocQueries.qSpanDedup.run(spark, dir)
      .as[(Long, Long, Long, String)].collect().toList

  private val span = "one two three four five six seven eight"

  test("duplicated cross-doc span is removed from the later doc only") {
    val dir = docsDir(Seq(
      // doc 0 holds the canonical occurrence -> unchanged -> not reported
      (0L, span + " ax bx cx dx ex fx gx hx"),
      (1L, "alpha beta " + span + " gamma delta"),
      // no 8-gram shared with anything -> not reported
      (2L, "totally unique words that never repeat anywhere else at all")))
    assert(run(dir) === List((1L, 12L, 8L, "alpha beta gamma delta")))
  }

  test("within-document repetition keeps only the first occurrence") {
    val dir = docsDir(Seq(
      (0L, "p q r s t u v w p q r s t u v w")))
    assert(run(dir) === List((0L, 16L, 8L, "p q r s t u v w")))
  }

  test("a fully-duplicated document masks down to empty text") {
    val dir = docsDir(Seq((0L, span), (1L, span)))
    assert(run(dir) === List((1L, 8L, 8L, "")))
  }

  test("documents shorter than the span width are never touched") {
    val dir = docsDir(Seq(
      (0L, "seven little words cannot form spans"),
      (1L, "seven little words cannot form spans")))
    assert(run(dir) === Nil)
  }
}
