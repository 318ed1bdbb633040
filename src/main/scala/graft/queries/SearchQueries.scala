package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.functions.TextFunctions._

/** Full-text retrieval operators over the `documents` corpus: inverted
  * index construction and BM25 relevance scoring — the search half of a
  * training-data pipeline (corpus exploration, quality-biased sampling,
  * retrieval-augmented filtering). The reference has no text-search
  * surface; this is extension coverage per the builder brief (SURVEY
  * §7.6), built as plain shuffled aggregates — no driver-side index.
  */
object SearchQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  /** Terms the BM25 query scores — fixed so the oracle can mirror them. */
  private val QueryTerms = Seq("join", "vector", "spark")

  /** Inverted index: per term, document frequency, total term frequency,
    * and the first 10 postings (doc_ids ascending), serialized as a
    * comma-joined string — list-typed output columns crash the driver
    * checker's sort (pandas can't order list cells), and a posting
    * list's wire format IS a flat encoding anyway.
    *
    * Scale: the posting list is truncated BEFORE collection — a
    * `row_number() <= 10` per term runs as WindowGroupLimit (partial
    * top-k map-side), so a stop-word's million-document posting list
    * never materializes in one task; only ≤ 10 rows per term reach the
    * `collect_list`. df/total_tf are plain partial/final hash aggregates.
    */
  val qInvertedIndex = QueryDef(
    "q_inverted_index",
    (s, dir) => {
      val cnt = docs(s, dir)
        .select(col("doc_id"), explode(words(col("text"))).as("term"))
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      val stats = cnt.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
      val postings = cnt
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("term")).orderBy(col("doc_id"))))
        .filter(col("rn") <= 10)
        .groupBy(col("term"))
        .agg(array_join(sort_array(collect_list(col("doc_id"))), ",")
          .as("postings"))
      stats.join(postings, Seq("term")).orderBy(col("term"))
    },
    Some(s"""
      WITH terms AS (
        SELECT doc_id, unnest(${wordsSql("text")}) AS term FROM documents),
      cnt AS (
        SELECT term, doc_id, count(*) AS tf FROM terms GROUP BY 1, 2),
      stats AS (
        SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
        FROM cnt GROUP BY 1),
      ranked AS (
        SELECT term, doc_id,
               row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        FROM cnt),
      postings AS (
        SELECT term, array_to_string(list_sort(list(doc_id)), ',') AS postings
        FROM ranked WHERE rn <= 10 GROUP BY 1)
      SELECT s.term, s.df, s.total_tf, p.postings
      FROM stats s JOIN postings p USING (term) ORDER BY term"""))

  /** BM25 scoring of a fixed 3-term query against every document, in
    * pure integer arithmetic (hash-match discipline, QueryDef scaladoc).
    *
    * The standard BM25 with k1 = 1.2 = 6/5 and b = 0.75 = 3/4 has a
    * rational tf-saturation component; multiplying through by the corpus
    * token total T (avgdl = T/N) gives
    *   tf_part = 44·tf·T / (20·tf·T + 6·T + 18·dl·N).
    * The idf factor is replaced by its log-argument — the Robertson
    * odds ratio (N − df + ½)/(df + ½) = (2N − 2df + 1)/(2df + 1) —
    * which is strictly monotone in df, so per-term ranking order is
    * identical to log-idf BM25 while staying exactly representable:
    * one correctly-rounded int→double division at the end is the only
    * float op, making Spark and DuckDB agree bit-for-bit (a log() would
    * not: libm results differ in the last ulp across engines).
    *
    * int64 headroom: num = 44·tf·T·(2N−2df+1). At sf1 (N ≈ 5·10⁴,
    * T ≈ 3·10⁶, tf ≤ 10²) num ≈ 10³·10⁶·10⁵ = 10¹⁴ ≪ 2⁶³; the terms
    * would overflow ANSI-loudly, not silently, at ~10⁴× that corpus —
    * at which point the factors should move to decimal.
    *
    * Scale: tf/df/dl are hash aggregates over (doc, term) pairs already
    * filtered to the query's terms — the corpus is scanned once and only
    * matching postings shuffle; df and the corpus totals are broadcast
    * scalars. Never a cartesian of docs × vocabulary.
    */
  val qBm25 = QueryDef(
    "q_bm25",
    (s, dir) => {
      val toks = docs(s, dir).select(col("doc_id"), words(col("text")).as("ws"))
      val dl = toks.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
      val corpus = dl.agg(sum(col("dl")).as("t_len"), count(lit(1)).as("n_docs"))
      val tf = toks
        .select(col("doc_id"), explode(col("ws")).as("term"))
        .filter(col("term").isin(QueryTerms: _*))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val num = lit(44L) * col("tf") * col("t_len") *
        (lit(2L) * col("n_docs") - lit(2L) * col("df") + lit(1L))
      val den = (lit(20L) * col("tf") * col("t_len") + lit(6L) * col("t_len") +
        lit(18L) * col("dl") * col("n_docs")) *
        (lit(2L) * col("df") + lit(1L))
      tf.join(dl, Seq("doc_id"))
        .join(broadcast(dfc), Seq("term"))
        .crossJoin(broadcast(corpus))
        .select(col("term"), col("doc_id"), col("tf"),
          (num.cast("double") / den).as("bm25_odds"))
        .orderBy(col("term"), col("doc_id"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, ${wordsSql("text")} AS ws FROM documents),
      dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM toks),
      corpus AS (
        SELECT CAST(sum(dl) AS BIGINT) AS t_len, count(*) AS n_docs FROM dl),
      tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(ws) AS term FROM toks)
        WHERE term IN (${QueryTerms.map(q => s"'$q'").mkString(", ")})
        GROUP BY 1, 2),
      dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
      SELECT t.term, t.doc_id, t.tf,
             CAST(44 * t.tf * c.t_len * (2 * c.n_docs - 2 * d.df + 1) AS DOUBLE)
               / ((20 * t.tf * c.t_len + 6 * c.t_len + 18 * l.dl * c.n_docs)
                  * (2 * d.df + 1)) AS bm25_odds
      FROM tf t JOIN dl l USING (doc_id) JOIN dfc d USING (term), corpus c
      ORDER BY term, doc_id"""))

  /** Exact set-similarity self-join at Jaccard ≥ 0.6 via PREFIX
    * FILTERING — the exact-threshold complement to q_dedup_minhash's
    * probabilistic LSH route. Tokens get a global canonical order
    * (ascending document frequency, ties by token — rarest first);
    * for |A∩B|/|A∪B| ≥ t it is sufficient that A and B share a token
    * among each one's first p = ⌊(1−t)·|set|⌋ + 1 tokens of that order
    * (if the prefixes were disjoint, the ≥ t·|set| shared tokens would
    * all have to hide in the suffixes — too short by construction). So
    * the candidate join is an equi-join ON PREFIX TOKENS ONLY — rare
    * tokens, small postings — never all-pairs, and the threshold test
    * is pure integers: J ≥ 3/5 ⟺ 8·inter ≥ 3·(|A|+|B|).
    *
    * Sets are distinct word TRIGRAMS (the decontaminate/minhash gram
    * unit), not unigrams — on this corpus's small shared vocabulary,
    * unigram sets make nearly every pair a candidate (measured 30k+
    * qualifying pairs); trigrams are discriminative (25 pairs from
    * ~11k candidates), which is also why real near-dup systems shingle.
    *
    * Scale: df ranking and per-doc position are one aggregate + one
    * window keyed on doc; the candidate fan-out is bounded by prefix
    * posting sizes (frequency-ordered prefixes make the indexed tokens
    * the RAREST ones) and pre-pruned by BOTH PPJoin filters before the
    * dedup shuffle: the length filter (5·min ≥ 3·max, implied by the
    * threshold) and the POSITION filter — a qualifying pair's first
    * common prefix token (the global (df, tok) order is shared by both
    * docs, so "first" is well-defined) still has all other common
    * tokens ahead of it in both suffixes, hence
    * inter ≤ 1 + min(|A|−posₐ, |B|−pos_b); rows violating
    * 8·(1 + min) ≥ 3·(|A|+|B|) cannot be a pair's first match and drop
    * out (measured: 193k → far fewer candidate rows at sf0.1, and the
    * filter runs map-side in the join's codegen stage). Neither filter
    * removes a true pair. Verification is per-pair `array_intersect`
    * against the per-doc trigram arrays — measured 2-4× over re-joining
    * the token table (which multiplies candidates by tokens-per-doc
    * across two shuffles). The array side carries NO broadcast hint:
    * AQE picks broadcast at this scale from runtime sizes (measured
    * ~0.5 s under the hinted plan here) and shifts to co-partitioned
    * shuffle joins on doc_id when the corpus outgrows the threshold —
    * same plan shape, bigger exchange, no code change. Soaked at 16×
    * (SCALE.md): the shuffle regime attaches the first doc's array to
    * every candidate row before the second join, so at extreme scale
    * (arrays too big even for a raised threshold) the right third form
    * is the narrow token-table count join (pair ⋈ toks on (doc, tok),
    * count per pair) — SHIPPED as [[qSetsimJoinCounts]] behind the
    * shared candidate generator, head-to-head soak in SCALE.md.
    * This is the PPJoin shape (Xiao et al., WWW'08).
    */
  /** Per-doc distinct-trigram arrays, session-cached (ChartQueries
    * idiom): the HOF construction (transform/slice/array_join —
    * interpreted, not codegen) is the query's single most expensive
    * leaf, and FOUR plan branches consume it (df counts, the ranking
    * window, and both verification sides) — without the cache each
    * branch recomputes it. Keyed on the documents file fingerprint so
    * appends/compactions miss instead of serving stale grams.
    */
  private val triCache =
    new graft.engine.SessionKeyedCache[DataFrame](_.unpersist())

  /** Cached max-distinct-trigrams-per-doc for [[chosenVerification]]'s
    * auto probe (corpus-static; keyed like [[triCache]]).
    */
  private val probeCache = new graft.engine.SessionKeyedCache[Int]

  private def trigrams(s: SparkSession, dir: String): DataFrame =
    // repartition BEFORE the shingle construction: the cached relation's
    // parallelism must come from the engine, not the input split count
    // (HashedGrams rationale — a single-row-group file would otherwise
    // freeze a 1-partition layout into the cache).
    triCache.getOrElseUpdate(s, dir, graft.engine.SessionKeyedCache
      .fileFingerprint(s, s"$dir/documents.parquet"))(
      docs(s, dir)
        .select(col("doc_id"), col("text"))
        // count pinned (round-18): see DocQueries.tokenized
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"),
          graft.functions.WordShingles(col("ws"), 3).as("ts"))
        .persist())

  /** PPJoin candidate pairs `(doc_a, doc_b, len_a, len_b)` — the
    * prefix/length/position-filtered survivor set both verification
    * forms start from (factored out so the array form and the
    * token-count form share one candidate generator).
    */
  private def setsimCandidates(s: SparkSession, dir: String): DataFrame = {
      val tri = trigrams(s, dir)
      val toks = tri.select(col("doc_id"),
        size(col("ts")).cast("long").as("len"), explode(col("ts")).as("tok"))
      val dfc = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      // p = len − ceil(3·len/5) + 1, in integer math
      val p = col("len") -
        call_function("div", lit(3L) * col("len") + 4, lit(5L)) + 1
      // Per-doc (df, tok) ranking WITHOUT a window: collect each doc's
      // token/df pairs, sort the small in-memory array, slice the
      // prefix, posexplode it back. Value-identical to
      // row_number().over(partitionBy(doc).orderBy(df, tok)) — (df,
      // tok) pairs are distinct within a doc, array_sort on the struct
      // is the same lexicographic order — but the sort is per-doc-array
      // (|doc| log |doc| each) instead of a partition-wide WindowExec
      // sort over the whole token stream ((N/p) log (N/p) per task):
      // measured 11.8 s → 4.3 s on the cumulative 16×-corpus probe,
      // and it only shuffles the prefix rows onward, never the ranked
      // suffix. Same (doc_id)-keyed exchange either way.
      val pref = toks.join(dfc, Seq("tok"))
        .groupBy(col("doc_id"), col("len"))
        .agg(array_sort(collect_list(struct(col("df"), col("tok"))))
          .as("sorted"))
        .select(col("doc_id"), col("len"),
          posexplode(slice(col("sorted"), lit(1), p.cast("int"))))
        .select(col("col.tok").as("tok"), col("doc_id"), col("len"),
          (col("pos") + 1).cast("long").as("pos"))
      val cand = pref.select(col("tok"), col("doc_id").as("doc_a"),
          col("len").as("len_a"), col("pos").as("pos_a"))
        .join(pref.select(col("tok"), col("doc_id").as("doc_b"),
          col("len").as("len_b"), col("pos").as("pos_b")), Seq("tok"))
        // length filter: J ≥ 3/5 forces 5·min(|A|,|B|) ≥ 3·max(|A|,|B|)
        // (i ≤ min, u ≥ max) — prunes before the distinct, changes no result
        .filter(col("doc_a") < col("doc_b") &&
          lit(5L) * least(col("len_a"), col("len_b")) >=
            lit(3L) * greatest(col("len_a"), col("len_b")) &&
          // position filter: a qualifying pair's FIRST common prefix token
          // bounds inter by 1 + min(remaining suffix lengths); later match
          // rows of the same pair may fail this, but the first one cannot,
          // so the distinct below still sees every true pair exactly once
          lit(8L) * (lit(1L) + least(col("len_a") - col("pos_a"),
            col("len_b") - col("pos_b"))) >=
            lit(3L) * (col("len_a") + col("len_b")))
        .select(col("doc_a"), col("doc_b"), col("len_a"), col("len_b"))
        .distinct()
      cand
  }

  /** Shared Jaccard epilogue: threshold in integer math, exact-ratio
    * output, deterministic order.
    */
  private def setsimEmit(inter: DataFrame): DataFrame =
    inter
      .filter(lit(8L) * col("inter") >= lit(3L) * (col("len_a") + col("len_b")))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("inter").cast("double") /
          (col("len_a") + col("len_b") - col("inter"))).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Array-payload verification: attach both docs' trigram arrays to
    * each candidate and intersect in place. Wins both soak axes at
    * every measured multiplier (SCALE.md) — the default regime.
    */
  private def verifyArrays(s: SparkSession, dir: String,
      cand: DataFrame): DataFrame = {
    val tri = trigrams(s, dir)
    cand
      .join(tri.select(col("doc_id").as("doc_a"), col("ts").as("ta")),
        Seq("doc_a"))
      .join(tri.select(col("doc_id").as("doc_b"), col("ts").as("tb")),
        Seq("doc_b"))
      .withColumn("inter",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
  }

  /** Token-count verification: fixed-width rows end to end — the
    * memory-bound fallback once per-doc arrays outgrow an exchange row
    * or a task (the 10⁵⁺-token regime).
    */
  private def verifyCounts(s: SparkSession, dir: String,
      cand: DataFrame): DataFrame = {
    val tokRel = trigrams(s, dir)
      .select(col("doc_id"), explode(col("ts")).as("tok"))
    cand
      .join(tokRel.select(col("doc_id").as("doc_a"), col("tok")),
        Seq("doc_a"))
      .join(tokRel.select(col("doc_id").as("doc_b"), col("tok")),
        Seq("doc_b", "tok"))
      .groupBy(col("doc_a"), col("doc_b"), col("len_a"), col("len_b"))
      .agg(count(lit(1)).as("inter"))
  }

  /** Which verification regime [[qSetsimJoin]] runs — the decision rule
    * the round-7/8 soaks established, encoded as session config instead
    * of a manual `.join` swap:
    *
    *  - `graft.setsim.verification = array | counts | auto` (default
    *    `auto`). Both forms emit identical rows (one shared oracle);
    *    the choice is purely an execution-shape decision.
    *  - `auto` picks `array` unless the corpus' LARGEST per-doc
    *    distinct-trigram set exceeds `graft.setsim.arrayMaxTokens`
    *    (default 100000). The soak evidence (SCALE.md §setsim, both
    *    axes to 64×/16×) shows the array form faster at every
    *    measurable multiplier — candidates × tokens join rows cost more
    *    than attaching two arrays — so the ONLY reason to switch is the
    *    memory cliff: a 10⁵-distinct-trigram doc (~2 MB of array
    *    payload per candidate row) starts threatening exchange row
    *    limits and task heap long before throughput favors counts. Max
    *    doc size, not average, is the binding constraint because one
    *    oversized doc's array rides along EVERY candidate pair it
    *    appears in.
    *
    * The probe aggregate runs over the session-cached trigram relation
    * (milliseconds; no extra corpus scan).
    */
  private[graft] def chosenVerification(s: SparkSession, dir: String): String =
    s.conf.get("graft.setsim.verification", "auto") match {
      case "array" => "array"
      case "counts" => "counts"
      case "auto" =>
        val cap = s.conf.get("graft.setsim.arrayMaxTokens", "100000").toLong
        // corpus-static probe, cached on the same fingerprint as the
        // trigram relation itself — one aggregate per corpus, not per
        // call (the uncached probe re-ran every bench rep: +0.5 s)
        val maxLen = probeCache.getOrElseUpdate(s, dir,
          graft.engine.SessionKeyedCache
            .fileFingerprint(s, s"$dir/documents.parquet"))(
          trigrams(s, dir)
            .agg(coalesce(max(size(col("ts"))), lit(0)).as("m"))
            .head.getInt(0))
        if (maxLen <= cap) "array" else "counts"
      case other => throw new IllegalArgumentException(
        s"graft.setsim.verification must be array|counts|auto, got '$other'")
    }

  val qSetsimJoin = QueryDef(
    "q_setsim_join",
    (s, dir) => {
      val cand = setsimCandidates(s, dir)
      val inter =
        if (chosenVerification(s, dir) == "array") verifyArrays(s, dir, cand)
        else verifyCounts(s, dir, cand)
      setsimEmit(inter)
    },
    Some(setsimOracle))

  /** The narrow token-table verification form of [[qSetsimJoin]] — the
    * documented "third form" SHIPPED: candidates join the exploded
    * (doc_id, tok) relation on doc_a, then match rows on (doc_b, tok),
    * and |intersection| is a per-pair count — fixed-width rows end to
    * end, no per-candidate array payload in any exchange. Same
    * candidates, same threshold, same output (the oracle is literally
    * the same SQL — its inter CTE already counts). Slower at harness
    * scale (the candidate × tokens fan-out costs more than attaching
    * two small arrays); the right shape once per-doc token arrays are
    * large enough to dominate the verification exchange. Soaked
    * head-to-head on BOTH axes (SCALE.md): the array form wins at
    * every measurable multiplier of doc count AND document length —
    * this form pays candidates × tokens join rows on either axis — so
    * it ships as the MEMORY-bound fallback: fixed-width rows are the
    * only shape that still executes once per-candidate array payloads
    * outgrow the exchange or a task (10⁵⁺-token documents).
    */
  val qSetsimJoinCounts = QueryDef(
    "q_setsim_join_counts",
    (s, dir) => setsimEmit(verifyCounts(s, dir, setsimCandidates(s, dir))),
    Some(setsimOracle),
    bench = false)

  private lazy val setsimOracle: String = s"""
      WITH w AS (SELECT doc_id, ${wordsSql("text")} AS ws FROM documents),
      toks AS (
        SELECT doc_id, unnest(list_distinct(
                 [array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws)-1)]))
               AS tok
        FROM w WHERE len(ws) >= 3),
      dfc AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1),
      ranked AS (
        SELECT t.doc_id, t.tok,
               count(*) OVER (PARTITION BY t.doc_id) AS len,
               row_number() OVER (PARTITION BY t.doc_id
                                  ORDER BY d.df, t.tok) AS pos
        FROM toks t JOIN dfc d USING (tok)),
      pref AS (
        SELECT tok, doc_id, len FROM ranked
        WHERE pos <= len - (3 * len + 4) // 5 + 1),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.len AS len_a, b.len AS len_b
        FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id),
      inter AS (
        SELECT c.doc_a, c.doc_b, c.len_a, c.len_b, count(*) AS inter
        FROM cand c
        JOIN toks ta ON ta.doc_id = c.doc_a
        JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
        GROUP BY 1, 2, 3, 4)
      SELECT doc_a, doc_b, inter,
             CAST(inter AS DOUBLE) / (len_a + len_b - inter) AS jaccard
      FROM inter WHERE 8 * inter >= 3 * (len_a + len_b)
      ORDER BY doc_a, doc_b"""

  val all: Seq[QueryDef] =
    Seq(qInvertedIndex, qBm25, qSetsimJoin, qSetsimJoinCounts)
}
