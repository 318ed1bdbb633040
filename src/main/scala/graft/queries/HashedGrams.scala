package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{h44, words}

/** The hashed word-n-gram relation `(doc_id, gh)` over the documents
  * table — distinct n-grams per doc ([[graft.functions.WordShingles]]),
  * h44-hashed — materialized ONCE per (session, dir, n) and shared by
  * every consumer, the way a real pipeline lands its shingle table
  * before the dedup/decontamination passes instead of re-shingling the
  * corpus inside each one. Before this, q_crossdoc_overlap and
  * q_decontaminate each evaluated the shingle scan TWICE (once per plan
  * branch; the df/eval side aggregates before its join, so Spark's
  * exchange reuse never fires) — the leaf is the single most expensive
  * part of both plans.
  *
  * Keyed on the documents file fingerprint (appends/compactions miss
  * instead of serving stale grams) and evicted-by-replacement via
  * [[graft.engine.SessionKeyedCache]], so a rewritten table also
  * unpersists the superseded blocks.
  *
  * The build repartitions on doc_id BEFORE the shingle expansion: a
  * materialized corpus-wide relation must take its parallelism from the
  * engine, not the input layout (a compact single-row-group file scans
  * as ONE split, and a narrow-only persist would freeze that single
  * partition into the cache — serializing the expensive explode+hash
  * here and the first stage of every consumer). The shuffle moves only
  * the raw (doc_id, text) rows once per session, and hash-placing by
  * doc_id also co-locates the relation for the per-doc aggregations
  * downstream.
  */
object HashedGrams {

  private val cache =
    new graft.engine.SessionKeyedCache[DataFrame](_.unpersist())

  def apply(s: SparkSession, dir: String, n: Int): DataFrame =
    cache.getOrElseUpdate(s, s"$dir|n=$n",
      graft.engine.SessionKeyedCache.fileFingerprint(
        s, s"$dir/documents.parquet"))(
      graft.engine.Tables.t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        // count pinned (round-18): see DocQueries.tokenized — AQE would
        // coalesce the byte-tiny proxy to one partition and serialize
        // the shingle expansion frozen into this cache
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= n)
        .select(col("doc_id"),
          explode(graft.functions.WordShingles(col("ws"), n)).as("gram"))
        .select(col("doc_id"), h44(col("gram")).as("gh"))
        .persist())
}
