package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.functions.TextFunctions._

/** Training-data curation operators the DocQueries dedup/quality family
  * doesn't cover: eval-set decontamination, PII redaction, and
  * deterministic weighted sampling (builder brief / SURVEY §7.6).
  */
object CurationQueries {

  /** Benchmark decontamination: flag training documents sharing word
    * n-grams with a held-out eval set — the standard pre-training hygiene
    * pass (eval here = every 97th doc, a deterministic stand-in for the
    * benchmark corpus). Distinct trigrams per doc are hashed to 44-bit
    * ints (md5-derived, engine-parity — see [[TextFunctions]]) and the
    * two sides join on the hash; pairs with ≥ 2 shared trigrams are
    * reported with their overlap count. The oracle joins on the SAME
    * 44-bit hash, so both engines agree bit-for-bit, collisions included
    * (at 44 bits a false shared gram needs ~4M distinct grams per pair
    * to reach 50%; real corpora use 64-128-bit gram hashes).
    *
    * Scale: the eval side is tiny by construction (benchmarks are KBs,
    * corpora are TBs) → broadcast the eval gram set; train grams stream
    * through the hash probe with no shuffle of the corpus, and the
    * groupBy shuffles only the surviving hit pairs. Both sides read the
    * session-materialized [[HashedGrams]] relation, so the corpus is
    * shingled once, not once per branch.
    */
  val qDecontaminate = QueryDef(
    "q_decontaminate",
    (s, dir) => {
      val grams = HashedGrams(s, dir, 3)
      val evalGrams = grams.filter(col("doc_id") % 97 === 0)
        .withColumnRenamed("doc_id", "eval_id")
      val trainGrams = grams.filter(col("doc_id") % 97 =!= 0)
        .withColumnRenamed("doc_id", "train_id")
      trainGrams.join(broadcast(evalGrams), Seq("gh"))
        .groupBy(col("train_id"), col("eval_id"))
        .agg(countDistinct(col("gh")).as("shared_ngrams"))
        .filter(col("shared_ngrams") >= 2)
        .orderBy(col("train_id"), col("eval_id"))
    },
    Some(s"""
      WITH w AS (
        SELECT doc_id, ${wordsSql("text")} AS ws FROM documents),
      g AS (
        SELECT doc_id, unnest(list_distinct(
                 [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)]))
               AS gram
        FROM w WHERE len(ws) >= 3),
      h AS (SELECT doc_id, ${h44Sql("gram")} AS gh FROM g)
      SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
             count(DISTINCT t.gh) AS shared_ngrams
      FROM h t JOIN h e ON t.gh = e.gh
      WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
      GROUP BY 1, 2 HAVING count(DISTINCT t.gh) >= 2
      ORDER BY train_id, eval_id"""))

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+1-555-[0-9]{4}"

  /** PII redaction: regex-scrub emails and phone numbers from document
    * text, reporting per-doc redaction counts and an md5 of the scrubbed
    * text (md5 is the engine-parity witness that the full redacted string
    * is identical; shipping whole scrubbed corpora through the oracle
    * diff would be the same check, slower). The synthetic corpus contains
    * no PII, so a deterministic contact line is appended per doc first —
    * the redaction then provably fires on every row. Patterns stay in the
    * regex subset Java and RE2 treat identically (char classes + bounded
    * repetition, no alternation/backtracking).
    *
    * Scale: pure per-row string work — codegen'd regexp_replace, no
    * shuffle at all until the output sort, which a real pipeline wouldn't
    * have (it writes back partition-wise).
    */
  val qPiiRedact = QueryDef(
    "q_pii_redact",
    (s, dir) => {
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" Contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(".")).as("txt"))
      withPii.select(
        col("doc_id"),
        size(regexp_extract_all(col("txt"), lit(EmailRe), lit(0)))
          .cast("bigint").as("n_emails"),
        size(regexp_extract_all(col("txt"), lit(PhoneRe), lit(0)))
          .cast("bigint").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("txt"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH p AS (
        SELECT doc_id,
               text || ' Contact user' || CAST(doc_id AS VARCHAR) ||
               '@example.com or +1-555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS txt
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(txt, '$EmailRe')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(txt, '$PhoneRe')) AS BIGINT) AS n_phones,
             md5(regexp_replace(regexp_replace(txt, '$EmailRe', '<EMAIL>', 'g'),
                 '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
      FROM p ORDER BY doc_id"""))

  /** Deterministic weighted Bernoulli sampling: accept each doc with
    * probability proportional to its length (p = min(1, n_chars/1000)),
    * decided by comparing a 20-bit md5-derived uniform draw against the
    * weight IN PURE INTEGER MATH — `u * 1000 < n_chars * 2^20` — so both
    * engines make the identical accept/reject call on every row (no
    * float pow/ln, which are not bit-portable). Seeded by a tagged key
    * (`wsmp|doc_id`), so re-runs and engines agree, and changing the tag
    * re-draws the sample. This is the curriculum/quality-weighting
    * primitive: swap n_chars for any integer quality score.
    *
    * Scale: stateless per-row predicate — embarrassingly parallel,
    * pushes through any partitioning, no coordination (vs reservoir
    * sampling, which needs a global pass).
    */
  val qWeightedSample = QueryDef(
    "q_weighted_sample",
    (s, dir) => t(s, dir, "documents")
      .withColumn("u20",
        pmod(h44(concat(lit("wsmp|"), col("doc_id").cast("string"))),
          lit(1L << 20)))
      .filter(col("u20") * 1000 < col("n_chars") * (1L << 20))
      .select(col("doc_id"), col("n_chars"), col("u20"))
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id, n_chars, u20 FROM (
        SELECT doc_id, n_chars,
               ${h44Sql("'wsmp|' || CAST(doc_id AS VARCHAR)")} % ${1L << 20} AS u20
        FROM documents)
      WHERE u20 * 1000 < n_chars * ${1L << 20}
      ORDER BY doc_id"""))

  /** Exact vocabulary heavy hitters: tokens above a relative frequency
    * threshold (≥ 0.5% of all tokens) — the stopword/boilerplate
    * discovery pass a corpus pipeline runs before quality scoring. The
    * threshold is relative, so the corpus total rides along as a
    * broadcast scalar and the comparison stays in integer math
    * (`n * 200 >= n_total`). Scale: the token groupBy is one shuffle
    * with map-side combine; the total is a separate SHUFFLE-FREE pass
    * (sum of per-doc token counts — no explode, a scalar per scan task),
    * so the corpus text is tokenized twice but shuffled once. The
    * sketch alternative (count-min / Misra-Gries) trades exactness for
    * one pass when even the token groupBy is too large; at this
    * threshold (≤ 200 survivors by construction) the exact path is the
    * right default.
    */
  val qHeavyHitters = QueryDef(
    "q_heavy_hitters",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val total = docs
        .agg(sum(size(words(col("text"))).cast("bigint")).as("n_total"))
      docs.select(explode(words(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .filter(col("n") * 200 >= col("n_total"))
        .orderBy(col("n").desc, col("tok"))
    },
    Some(s"""
      WITH toks AS (
        SELECT unnest(${wordsSql("text")}) AS tok FROM documents),
      tot AS (SELECT count(*) AS n_total FROM toks)
      SELECT tok, count(*) AS n, (SELECT n_total FROM tot) AS n_total
      FROM toks GROUP BY tok
      HAVING count(*) * 200 >= (SELECT n_total FROM tot)
      ORDER BY n DESC, tok"""))

  /** Hash-blocking geometry for [[qNegativeSample]] (declared before the
    * QueryDef vals that capture them at object-init time).
    */
  private val NegBuckets = 32L
  private val NegK = 2

  /** Deterministic train/val/test split — the assignment every training
    * corpus needs, done the only way that survives re-runs and corpus
    * growth: a pure hash of the stable document id (80/10/10 on
    * h44(doc_id) mod 100), never a random() that reshuffles documents
    * between splits on every execution. Reported as per-(lang, split)
    * counts with the split's share of the language — the leakage audit
    * a data team reads before training. Per-row hash + one hash
    * aggregate; embarrassingly parallel at any scale.
    */
  val qDatasetSplit = QueryDef(
    "q_dataset_split",
    (s, dir) => {
      val h = h44(col("doc_id").cast("string")) % 100
      val split = when(h < 80, "train").when(h < 90, "val").otherwise("test")
      t(s, dir, "documents")
        .select(col("lang"), split.as("split"), col("n_chars"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .withColumn("lang_share",
          col("n_docs").cast("double") /
            sum(col("n_docs")).over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
        .orderBy(col("lang"), col("split"))
    },
    Some("""
      WITH d AS (
        SELECT lang, n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 11)) AS BIGINT) % 100 AS h
        FROM documents),
      g AS (
        SELECT lang,
               CASE WHEN h < 80 THEN 'train'
                    WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
               count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM d GROUP BY 1, 2)
      SELECT lang, split, n_docs, n_chars,
             CAST(n_docs AS DOUBLE) /
               CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS lang_share
      FROM g ORDER BY lang, split"""))

  /** Contrastive negative sampling with hash blocking: K pseudo-random
    * negatives per document, fully deterministic — the pair-mining step
    * of an embedding/reranker training pipeline. Every document lands
    * in one of [[NegBuckets]] hash buckets and gets a stable in-bucket
    * rank; each (doc, k) probe hashes to a target bucket and a position
    * inside it, and the member at that position is the negative
    * (self-picks filtered). Work is O(K·n) with NO quadratic pair
    * enumeration — the classic all-pairs trap — and every join is
    * equi-keyed on (bucket, rank): hash joins end to end, the bucket
    * count is the only broadcast.
    *
    * Scale: [[NegBuckets]] is a small constant, so ranking members
    * `PARTITION BY bucket` directly would funnel n/32 docs through one
    * task — the rank is decomposed (the q_quantile_normalize pattern):
    * a cumulative count over the (bucket, doc_id-block) histogram
    * gives each block its rank offset, and the window ranks only
    * WITHIN one (bucket, block) — a data-scaled partition key. Rank
    * values are identical to the direct form (doc_id order per
    * bucket), so the oracle is unchanged.
    */
  val qNegativeSample = QueryDef(
    "q_negative_sample",
    (s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val bucketed = docs.select(col("doc_id"),
        (h44(col("doc_id").cast("string")) % NegBuckets).as("bucket"),
        shiftright(col("doc_id"), 8).as("blk"))
      val hist = bucketed.groupBy(col("bucket"), col("blk"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("blk_before",
          sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("bucket")).orderBy(col("blk"))) - col("cnt"))
        .select(col("bucket"), col("blk"), col("blk_before"))
      val inBlk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bucket"), col("blk")).orderBy(col("doc_id"))
      val members = bucketed.join(hist, Seq("bucket", "blk"))
        .withColumn("rnk",
          col("blk_before") + row_number().over(inBlk).cast("long") - 1)
      val sizes = members.groupBy(col("bucket"))
        .agg(count(lit(1)).as("bucket_n"))
      val probes = docs
        .crossJoin(s.range(1, NegK + 1).select(col("id").as("k")))
        .select(col("doc_id"), col("k"),
          (h44(concat(col("doc_id").cast("string"), lit("#"),
            col("k").cast("string"))) % NegBuckets).as("bucket"),
          h44(concat(lit("pos:"), col("doc_id").cast("string"), lit("#"),
            col("k").cast("string"))).as("ph"))
        .join(broadcast(sizes), Seq("bucket"))
        .select(col("doc_id"), col("k"), col("bucket"),
          (col("ph") % col("bucket_n")).as("rnk"))
      probes.join(members.select(col("bucket"), col("rnk"),
          col("doc_id").as("neg_id")), Seq("bucket", "rnk"))
        .filter(col("neg_id") =!= col("doc_id"))
        .select(col("doc_id"), col("k"), col("neg_id"))
        .orderBy(col("doc_id"), col("k"))
    },
    Some(s"""
      WITH docs AS (SELECT doc_id FROM documents),
      members AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 11)) AS BIGINT) % $NegBuckets AS bucket,
               CAST(row_number() OVER (
                 PARTITION BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 11)) AS BIGINT) % $NegBuckets
                 ORDER BY doc_id) AS BIGINT) - 1 AS rnk
        FROM docs),
      sizes AS (SELECT bucket, count(*) AS bucket_n FROM members GROUP BY 1),
      probes AS (
        SELECT d.doc_id, ks.k,
               CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(ks.k AS VARCHAR)), 1, 11)) AS BIGINT) % $NegBuckets AS bucket,
               CAST(('0x' || substr(md5('pos:' || CAST(d.doc_id AS VARCHAR) || '#' || CAST(ks.k AS VARCHAR)), 1, 11)) AS BIGINT) AS ph
        FROM docs d CROSS JOIN (SELECT unnest(range(1, ${NegK + 1})) AS k) ks)
      SELECT p.doc_id, p.k, m.doc_id AS neg_id
      FROM (SELECT doc_id, k, bucket, ph % s.bucket_n AS rnk
            FROM probes JOIN sizes s USING (bucket)) p
      JOIN members m USING (bucket, rnk)
      WHERE m.doc_id <> p.doc_id
      ORDER BY p.doc_id, p.k"""))

  /** Deterministic exact-k sample per group (reservoir-sampling
    * semantics, reproducible): order each language's documents by an
    * md5 draw keyed on doc_id and keep the first 5 — every doc equally
    * likely under the hash, identical picks on every run and engine.
    * Complements [[qWeightedSample]] (Bernoulli, expected-size) and
    * qDatasetSplit (disjoint shares) with the exact-cardinality form.
    *
    * Scale: `row_number() <= k` over (group, hash) is planned as
    * WindowGroupLimit — Spark keeps a k-row heap per group on the map
    * side, so the shuffle carries ~k rows per group, not the corpus.
    */
  val qReservoirSample = QueryDef(
    "q_reservoir_sample",
    (s, dir) => {
      val drawn = t(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          md5(concat(lit("rsv:"), col("doc_id").cast("string"))).as("draw"))
      drawn
        .withColumn("pick", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("draw"), col("doc_id"))))
        .filter(col("pick") <= 5)
        .select(col("lang"), col("pick").cast("long").as("pick"), col("doc_id"))
        .orderBy(col("lang"), col("pick"))
    },
    Some("""
      SELECT lang, CAST(pick AS BIGINT) AS pick, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5('rsv:' || CAST(doc_id AS VARCHAR)), doc_id)
                 AS pick
        FROM documents)
      WHERE pick <= 5 ORDER BY lang, pick"""))

  /** k-anonymity audit (k = 5) — the structural half of the privacy
    * pass next to [[qPiiRedact]]'s content half: group documents by
    * their quasi-identifier tuple (lang, source, length decile) and
    * report equivalence classes smaller than k, whose members are
    * re-identifiable by attribute combination alone. One hash
    * aggregate + HAVING; at corpus scale this is the same partial/final
    * shape as any rollup, and the violating classes (the output) are
    * small by definition.
    */
  val qKAnonymity = QueryDef(
    "q_k_anonymity",
    (s, dir) => t(s, dir, "documents")
      .select(col("lang"), col("source"),
        call_function("div", col("n_chars"), lit(100L)).as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < 5)
      .orderBy(col("lang"), col("source"), col("len_bucket")),
    Some("""
      SELECT lang, source, n_chars // 100 AS len_bucket,
             count(*) AS class_size
      FROM documents GROUP BY 1, 2, 3 HAVING count(*) < 5
      ORDER BY lang, source, len_bucket"""))

  /** Leakage-proof train/val/test split: q_dataset_split hashes the
    * document id, which still leaks NEAR-duplicates across splits —
    * a val doc whose 95%-identical twin sits in train contaminates
    * every eval number. The fix every serious corpus pipeline ships:
    * split by the DUP-GROUP representative (the MinHash-LSH connected
    * component from q_dedup_groups; singletons represent themselves),
    * so an entire near-dup family co-travels by construction.
    * CurationSpec proves zero cross-split dup edges — and that the
    * naive id-hash split does leak on this corpus.
    *
    * Scale: the group labels come from the banded-LSH label propagation
    * (never all-pairs); the assignment itself is a left join against a
    * labels table that only contains DUPLICATED docs (≪ corpus), then a
    * pure per-row hash — embarrassingly parallel.
    */
  val qSplitLeakproof = QueryDef(
    "q_split_leakproof",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val assign = d.select(col("doc_id"))
        .join(DocQueries.dupGroups(d), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("dup_group"), col("doc_id")).as("gk"))
      val h = h44(col("gk").cast("string")) % 100
      assign
        .withColumn("split",
          when(h < 80, "train").when(h < 90, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("gk")).as("n_groups"))
        .orderBy(col("split"))
    },
    Some(DocQueries.dupGroupsCte + """,
      assign AS (
        SELECT d.doc_id, COALESCE(g.dup_group, d.doc_id) AS gk
        FROM documents d LEFT JOIN groups g ON g.doc_id = d.doc_id),
      sp AS (
        SELECT doc_id, gk,
               CAST(('0x' || substr(md5(CAST(gk AS VARCHAR)), 1, 11)) AS BIGINT)
                 % 100 AS h
        FROM assign)
      SELECT CASE WHEN h < 80 THEN 'train'
                  WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
             count(*) AS n_docs, count(DISTINCT gk) AS n_groups
      FROM sp GROUP BY 1 ORDER BY split"""),
    bench = false)

  /** Cross-source score calibration by quantile normalization: a raw
    * quality score (n_chars stands in) is meaningless across sources
    * with different distributions — before mixing corpora, each doc's
    * score becomes its within-source percentile, so one global
    * threshold treats every source fairly. Rank is a row_number with a
    * doc_id tie-break (deterministic, unlike percent_rank's tie
    * plateaus) and the percentile is `(rk−1)/(n−1)` — two integers, one
    * final double division, identical in both engines.
    *
    * Scale: `source` has a handful of distinct values, so ranking the
    * raw table `PARTITION BY source` would funnel the whole corpus
    * through a few tasks — the rank is decomposed instead: a cumulative
    * count over the per-(source, n_chars) HISTOGRAM (window input
    * |distinct scores|, not |docs|) gives each score value its rank
    * offset, and the doc_id tie-break ranks only WITHIN one (source,
    * n_chars) bucket — a fine-grained, data-scaled partition key that
    * shares its shuffle with the histogram join. No operator sees a
    * near-global partition; the output is still one row per document.
    */
  val qQuantileNormalize = QueryDef(
    "q_quantile_normalize",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val bySource = Window.partitionBy(col("source"))
      val hist = d.groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum_before",
          sum(col("cnt")).over(bySource.orderBy(col("n_chars"))) - col("cnt"))
        .withColumn("n", sum(col("cnt")).over(bySource))
        .select(col("source"), col("n_chars"), col("cum_before"), col("n"))
      val inBucket = Window.partitionBy(col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
      d.join(hist, Seq("source", "n_chars"))
        .withColumn("rk",
          col("cum_before") + row_number().over(inBucket).cast("long"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          when(col("n") === 1, lit(0.0))
            .otherwise((col("rk") - 1).cast("double") / (col("n") - 1))
            .as("pct_rank"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH r AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (PARTITION BY source
                 ORDER BY n_chars, doc_id) AS rk,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents)
      SELECT doc_id, source, n_chars,
             CASE WHEN n = 1 THEN 0.0
                  ELSE CAST(rk - 1 AS DOUBLE) / (n - 1) END AS pct_rank
      FROM r ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(qDecontaminate, qPiiRedact, qWeightedSample,
    qHeavyHitters, qDatasetSplit, qNegativeSample, qReservoirSample,
    qKAnonymity, qSplitLeakproof, qQuantileNormalize)
}
