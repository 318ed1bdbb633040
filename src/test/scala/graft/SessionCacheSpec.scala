package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.SessionKeyedCache

/** Eviction semantics of the query layer's keyed cache: a prefix
  * re-inserted under a NEW fingerprint must evict (and hand to the
  * evict callback — i.e. unpersist) the superseded value, while
  * distinct prefixes and the one-key overload never cross-evict.
  */
class SessionCacheSpec extends AnyFunSuite {

  test("fingerprint change evicts the superseded entry through the callback") {
    val s = TestSpark.spark
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val c = new SessionKeyedCache[String](evicted += _)
    assert(c.getOrElseUpdate(s, "tableA", "fp1")("v1") == "v1")
    assert(c.getOrElseUpdate(s, "tableA", "fp1")("WRONG") == "v1")
    assert(evicted.isEmpty)
    // same prefix, new fingerprint: v1 must be evicted, v2 installed
    assert(c.getOrElseUpdate(s, "tableA", "fp2")("v2") == "v2")
    assert(evicted.toSeq == Seq("v1"))
    assert(c.getOrElseUpdate(s, "tableA", "fp2")("WRONG") == "v2")
  }

  test("distinct prefixes never cross-evict") {
    val s = TestSpark.spark
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val c = new SessionKeyedCache[String](evicted += _)
    c.getOrElseUpdate(s, "tableA", "fp1")("a")
    c.getOrElseUpdate(s, "tableB", "fp9")("b")
    assert(c.getOrElseUpdate(s, "tableA", "fp1")("WRONG") == "a")
    assert(c.getOrElseUpdate(s, "tableB", "fp9")("WRONG") == "b")
    assert(evicted.isEmpty)
  }

  test("one-key entries are their own prefix and never evicted by others") {
    val s = TestSpark.spark
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val c = new SessionKeyedCache[String](evicted += _)
    c.getOrElseUpdate(s, "pathX")("x")
    c.getOrElseUpdate(s, "pathY")("y")
    assert(c.getOrElseUpdate(s, "pathX")("WRONG") == "x")
    assert(evicted.isEmpty)
  }

  test("HashedGrams returns the one materialized relation per (dir, n)") {
    val s = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val a = graft.queries.HashedGrams(s, dir, 3)
    val b = graft.queries.HashedGrams(s, dir, 3)
    // same cached instance (plan identity, not just value equality) —
    // both consumers reuse one persisted shingle table
    assert(a eq b)
    assert(a.storageLevel.useMemory)
    assert(graft.queries.HashedGrams(s, dir, 8) ne a)
    assert(a.columns.toSeq == Seq("doc_id", "gh"))
  }
}
