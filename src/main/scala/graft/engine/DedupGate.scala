package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.MinhashK

/** Incremental near-duplicate admission gate — the day-2 operation of
  * the dedup family: screen a NEW corpus drop against the already-
  * admitted corpus and let only novel documents through. This is the
  * reference's `ON CONFLICT DO NOTHING` idempotency contract
  * (`transformed_from_s3_to_pg.py:146-151`) lifted from exact-key
  * equality to near-duplicate similarity, which is what corpus
  * ingestion actually needs (a re-crawled page is rarely byte-equal).
  *
  * Mechanics: both sides map to MinHash-LSH band rows
  * ([[graft.queries.DocQueries.minhashBands]]); candidates are the
  * equi-join of incoming bands against existing bands (bucket collision
  * only — never incoming × existing); a candidate is a REJECT when the
  * full signatures agree on ≥ 11/12 positions (estimated Jaccard ≈ 0.92,
  * the q_dedup_minhash threshold). In-batch duplicates are then
  * collapsed by the same test within the incoming drop, keeping the
  * lowest doc_id — so admitting the same drop twice is a no-op:
  * run₁ admits the novel docs, run₂ finds every doc near-dup to its
  * already-admitted copy.
  *
  * Scale: the existing side is touched only through its band index
  * (b·k rows per admitted doc, grouped by band key); the join shuffles
  * on (m, bkey) where near-dups concentrate; signature agreement is a
  * fixed-width array comparison. At 100 TB the band index is the thing
  * you PERSIST (date-partitioned, upserted with the same
  * [[Upsert]] machinery), not recompute — admitting a daily drop costs
  * O(drop) signatures plus a bucket-join against the index.
  */
object DedupGate {

  // codegen agreement count ([[graft.functions.MinHashAgree]]): this
  // predicate lands in the band join's bound condition, where the
  // interpreted zip_with chain was the round-9 sweep's hottest finding
  private def agree(sa: String, sb: String) =
    graft.functions.MinHashAgree(col(sa), col(sb))

  /** Documents of `incoming` (doc_id, text, …) that are near-dup to no
    * `existing` document and no LOWER-doc_id incoming survivor.
    */
  def admit(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val doc = graft.queries.DocQueries
    val in = doc.minhashBands(incoming.select(col("doc_id"), col("text")))
    val ex = doc.minhashBands(existing.select(col("doc_id"), col("text")))

    // reject against the admitted corpus
    val vsExisting = in.join(
        ex.select(col("m"), col("bkey"), col("sig").as("ex_sig")),
        Seq("m", "bkey"))
      .filter(agree("sig", "ex_sig") >= MinhashK - 1)
      .select(col("doc_id")).distinct()

    // collapse in-batch near-dup groups: survivor = lowest doc_id.
    // Transitivity note: rejection is vs the lowest-id member of the
    // candidate pair, matching q_dedup_groups' first-wins election.
    val inPairs = in.select(col("m"), col("bkey"),
        col("doc_id").as("doc_a"), col("sig").as("sa"))
      .join(in.select(col("m"), col("bkey"),
        col("doc_id").as("doc_b"), col("sig").as("sb")), Seq("m", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(agree("sa", "sb") >= MinhashK - 1)
      .select(col("doc_b").as("doc_id")).distinct()

    incoming
      .join(vsExisting, Seq("doc_id"), "left_anti")
      .join(inPairs, Seq("doc_id"), "left_anti")
  }
}
