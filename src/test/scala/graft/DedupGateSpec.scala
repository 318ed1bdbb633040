package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.DedupGate

/** The incremental near-dup admission contract: novel docs pass, docs
  * near-dup to the admitted corpus are rejected, in-batch dups collapse
  * to the lowest doc_id, and re-admitting the same drop is a no-op.
  */
class DedupGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // long texts so one changed word keeps estimated Jaccard >= 11/12
  private val base = ("alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo sierra " +
    "tango uniform victor whiskey xray yankee zulu one two three four " +
    "five six seven eight nine ten eleven twelve thirteen fourteen").split(" ")

  private def text(changed: Int): String =
    base.zipWithIndex.map { case (w, i) =>
      if (i < changed) s"swapped$i" else w }.mkString(" ")

  private def docs(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("novel docs pass, near-dups of the corpus and of the batch are rejected") {
    val existing = docs(Seq(100L -> text(0)))
    val incoming = docs(Seq(
      1L -> text(1),                       // near-dup of existing 100 -> reject
      2L -> "completely different words entirely unrelated to the corpus body here",
      3L -> "completely different words entirely unrelated to the corpus body here",
      // 3 duplicates 2 in-batch -> lowest id 2 survives
      4L -> "another genuinely novel document with its own fresh vocabulary set"))
    val admitted = DedupGate.admit(existing, incoming)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === Set(2L, 4L))
  }

  test("re-admitting the same drop against the grown corpus is a no-op") {
    val existing = docs(Seq(100L -> text(0)))
    val drop = docs(Seq(
      1L -> "completely different words entirely unrelated to the corpus body here",
      2L -> text(1)))
    val admitted1 = DedupGate.admit(existing, drop)
    assert(admitted1.select("doc_id").as[Long].collect().toSet === Set(1L))
    // the corpus after run 1: existing + what run 1 admitted (new ids)
    val grown = existing.unionByName(
      admitted1.select(($"doc_id" + 1000L).as("doc_id"), $"text"))
    val admitted2 = DedupGate.admit(grown, drop)
    assert(admitted2.count() === 0L, "second admission of the same drop must be empty")
  }
}
