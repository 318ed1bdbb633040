package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.functions.TextFunctions._

/** Training-batch assembly operators over `documents` — the steps that
  * sit between a curated corpus and a training run: sequence packing,
  * domain-mixture reweighting, and cross-document duplication scoring.
  * No reference analogue (extension surface, SURVEY §7.6).
  */
object TrainingQueries {

  /** Concat-and-chunk sequence packing: documents are laid out in
    * deterministic doc_id order and cut into fixed-capacity training
    * bins; each document is assigned to the bin where it STARTS
    * (`floor(cum_before / capacity)`), so bins can overflow by at most
    * one document tail — the accounting a packing loader needs.
    *
    * Scale: the running cumsum is [[graft.engine.DistributedRank]] —
    * a range-partitioned sort by doc_id plus per-partition offset
    * scans, so the corpus-wide layout never passes through one task
    * (the previous form was a single unpartitioned window). A sharded
    * layout (pack within source, offset bins per shard) would relax
    * the total order if even the range sort ever bound.
    */
  val qSeqPack = QueryDef(
    "q_seq_pack",
    (s, dir) => {
      val cap = 512L
      graft.engine.DistributedRank.cumsum(
        t(s, dir, "documents")
          .select(col("doc_id"),
            size(words(col("text"))).cast("bigint").as("tokens")),
        Seq(col("doc_id")), "tokens", "cum")
        .withColumn("bin", call_function("div", col("cum") - col("tokens"), lit(cap)))
        .groupBy(col("bin"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("tokens")).as("total_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"),
          greatest(sum(col("tokens")) - cap, lit(0L)).as("overflow_tokens"))
        .orderBy(col("bin"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, CAST(len(${wordsSql("text")}) AS BIGINT) AS tokens
        FROM documents),
      laid AS (
        SELECT doc_id, tokens,
               SUM(tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM toks)
      SELECT CAST((cum - tokens) // 512 AS BIGINT) AS bin,
             count(*) AS n_docs,
             CAST(SUM(tokens) AS BIGINT) AS total_tokens,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             CAST(greatest(SUM(tokens) - 512, 0) AS BIGINT) AS overflow_tokens
      FROM laid GROUP BY 1 ORDER BY bin"""))

  /** Domain-mixture reweighting: per-language sampling weight that
    * flattens the corpus to a uniform language mixture —
    * `weight = (total / n_langs) / cnt`, computed as ONE double
    * division of exact integers (identical IEEE result on both
    * engines). `oversample` flags groups that would need repetition
    * (weight > 1), the signal a data loader acts on.
    */
  val qMixtureWeights = QueryDef(
    "q_mixture_weights",
    (s, dir) => {
      val perLang = t(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      val totals = perLang.agg(
        sum(col("cnt")).as("total"), count(lit(1)).as("n_langs"))
      perLang.crossJoin(broadcast(totals))
        .select(
          col("lang"), col("cnt"),
          (col("total").cast("double") / (col("n_langs") * col("cnt")).cast("double"))
            .as("weight"),
          (col("total") < col("n_langs") * col("cnt")).as("downsampled"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH per_lang AS (
        SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
      totals AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_langs FROM per_lang)
      SELECT lang, cnt,
             CAST(total AS DOUBLE) / CAST(n_langs * cnt AS DOUBLE) AS weight,
             total < n_langs * cnt AS downsampled
      FROM per_lang CROSS JOIN totals ORDER BY lang"""))

  /** Cross-document duplication score: for each document, the share of
    * its distinct 8-word shingles that also occur in at least one OTHER
    * document. This is the fuzzy-overlap audit a dedup pipeline runs
    * AFTER exact dedup — high scores mean templated/boilerplate content
    * that MinHash may keep (SURVEY §7.6).
    *
    * Scale: shuffles on the 44-bit shingle hash only (document
    * frequency is a plain groupBy); per-doc rollup joins doc→shingle
    * back to the df table. Never all-pairs, never moves text twice —
    * the shingle relation itself is the session-materialized
    * [[HashedGrams]] table, so the scan+shingle leaf the df aggregate
    * and the rollup both consume runs once, not once per branch.
    */
  val qCrossdocOverlap = QueryDef(
    "q_crossdoc_overlap",
    (s, dir) => {
      val grams = HashedGrams(s, dir, 8)
      val df = grams.groupBy(col("gh"))
        .agg(countDistinct(col("doc_id")).as("df"))
      grams.join(df, Seq("gh"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_shingles"),
          sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_shared"))
        .withColumn("dup_share",
          col("n_shared").cast("double") / col("n_shingles").cast("double"))
        .filter(col("n_shared") > 0)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH w AS (
        SELECT doc_id, ${wordsSql("text")} AS ws FROM documents),
      g AS (
        SELECT doc_id, unnest(list_distinct(
                 [array_to_string(ws[i:i+7], ' ') for i in range(1, len(ws)-6)]))
               AS gram
        FROM w WHERE len(ws) >= 8),
      h AS (SELECT doc_id, ${h44Sql("gram")} AS gh FROM g),
      df AS (SELECT gh, count(DISTINCT doc_id) AS df FROM h GROUP BY gh)
      SELECT doc_id, count(*) AS n_shingles,
             CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
             CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS dup_share
      FROM h JOIN df USING (gh)
      GROUP BY doc_id
      HAVING SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) > 0
      ORDER BY doc_id"""))

  /** Tokenizer-vocabulary construction by coverage cutoff: rank tokens
    * by corpus frequency and keep the prefix that covers 90% of total
    * token mass — the standard vocab-size selection step before
    * tokenizer training. The cutoff test is pure integer arithmetic
    * (`(cum − freq) * 10 < total * 9`: a token is kept iff the mass
    * BEFORE it is under 90%), so the boundary token is included exactly
    * as a cumulative-distribution textbook would.
    *
    * Scale: the corpus collapses to a vocabulary-sized frequency table
    * in the first (map-side combined) aggregate; the ordered
    * rank+cumsum is then [[graft.engine.DistributedRank]] over the
    * VOCAB — range-partitioned even at a 10M-type vocabulary, and the
    * token-mass total falls out of its phase-1 stats (no second
    * evaluation of the frequency aggregate).
    */
  val qVocabCoverage = QueryDef(
    "q_vocab_coverage",
    (s, dir) => {
      val freqs = t(s, dir, "documents")
        .select(explode(words(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      graft.engine.DistributedRank(freqs,
        Seq(col("freq").desc, col("tok")),
        graft.engine.DistributedRank.Spec(rankCol = Some("vocab_rank"),
          valueCol = Some("freq"), cumCol = Some("cum"),
          totalCol = Some("total")))
        .filter((col("cum") - col("freq")) * 10 < col("total") * 9)
        .select(col("vocab_rank"), col("tok"), col("freq"),
          (col("cum").cast("double") / col("total")).as("cum_share"))
        .orderBy(col("vocab_rank"))
    },
    Some(s"""
      WITH f AS (
        SELECT tok, count(*) AS freq
        FROM (SELECT unnest(${wordsSql("text")}) AS tok FROM documents)
        GROUP BY tok),
      tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM f),
      r AS (
        SELECT tok, freq,
               row_number() OVER (ORDER BY freq DESC, tok) AS vocab_rank,
               CAST(SUM(freq) OVER (ORDER BY freq DESC, tok
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM f)
      SELECT vocab_rank, tok, freq,
             CAST(cum AS DOUBLE) / (SELECT total FROM tot) AS cum_share
      FROM r
      WHERE (cum - freq) * 10 < (SELECT total FROM tot) * 9
      ORDER BY vocab_rank"""))

  /** BPE merge-candidate statistics: adjacent character-pair counts
    * over the corpus, weighted by word frequency — the inner loop of
    * byte-pair-encoding tokenizer training (the highest-count pair is
    * the next merge). The pivotal scale property is that pairs are
    * derived from the VOCABULARY (distinct words × their corpus
    * frequency), never by re-walking the token stream: one corpus scan
    * builds the word-frequency table, and every merge iteration after
    * that is O(|vocab|) — exactly how production BPE trainers stay
    * tractable on TB corpora.
    */
  val qBpePairs = QueryDef(
    "q_bpe_pairs",
    (s, dir) => {
      val wordFreq = t(s, dir, "documents")
        .select(explode(words(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      wordFreq
        .filter(length(col("w")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("pair_freq"))
        .orderBy(col("pair_freq").desc, col("pair"))
    },
    Some(s"""
      WITH wf AS (
        SELECT w, count(*) AS freq
        FROM (SELECT unnest(${wordsSql("text")}) AS w FROM documents)
        GROUP BY w),
      p AS (
        SELECT unnest([substr(w, i, 2) for i in range(1, len(w))]) AS pair,
               freq
        FROM wf WHERE len(w) >= 2)
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_freq
      FROM p GROUP BY pair ORDER BY pair_freq DESC, pair"""))

  /** Deterministic span-corruption plan (T5-style masking prep): every
    * document gets mask spans of 3 tokens starting every 20 tokens at a
    * per-document hash phase — ~15% corruption, non-overlapping by
    * construction, and bit-reproducible across runs and engines (the
    * property a training pipeline needs so restarts and replicas mask
    * identically). Emits (doc, span_start, masked_span).
    *
    * Scale: one doc-keyed window supplies both lookahead tokens; span
    * selection is per-row modular arithmetic on the position — no
    * rejection sampling, no driver-side randomness.
    */
  val qMaskSpans = QueryDef(
    "q_mask_spans",
    (s, dir) => {
      val stride = 20
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), posexplode(words(col("text"))))
        .withColumnRenamed("pos", "pos0").withColumnRenamed("col", "tok")
        .select(col("doc_id"), col("pos0").cast("long").as("pos"), col("tok"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val phase = h44(col("doc_id").cast("string")) % stride
      toks
        .withColumn("t1", lead(col("tok"), 1).over(w))
        .withColumn("t2", lead(col("tok"), 2).over(w))
        .filter(pmod(col("pos"), lit(stride.toLong)) === phase &&
          col("t2").isNotNull)
        .select(col("doc_id"), col("pos").as("span_start"),
          concat_ws(" ", col("tok"), col("t1"), col("t2")).as("masked_span"))
        .orderBy(col("doc_id"), col("span_start"))
    },
    Some(s"""
      WITH tk AS (
        SELECT doc_id, unnest(ws) AS tok,
               CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS pos
        FROM (SELECT doc_id, ${wordsSql("text")} AS ws FROM documents)),
      led AS (
        SELECT doc_id, pos, tok,
               lead(tok, 1) OVER w AS t1, lead(tok, 2) OVER w AS t2
        FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
      SELECT doc_id, pos AS span_start,
             tok || ' ' || t1 || ' ' || t2 AS masked_span
      FROM led
      WHERE pos % 20 = ${h44Sql("CAST(doc_id AS VARCHAR)")} % 20
        AND t2 IS NOT NULL
      ORDER BY doc_id, span_start"""))

  /** OOV audit — applying the q_vocab_coverage vocabulary back to the
    * corpus: per source, what share of token occurrences falls outside
    * the 90%-mass vocab. This is the acceptance check run after
    * choosing a tokenizer vocabulary (a source with a high OOV share
    * will fragment into bytes and train badly). Counts exact; one
    * final double division.
    *
    * Scale: the vocab is by construction small enough to broadcast
    * (it IS the head of the frequency distribution); the token stream
    * is pre-aggregated to (source, token, n) with map-side combine
    * before the probe, so the broadcast join touches vocabulary-sized
    * relations, not the stream.
    */
  val qOovAudit = QueryDef(
    "q_oov_audit",
    (s, dir) => {
      // single corpus scan: global frequencies are the per-source
      // aggregate re-rolled, not a second explode of the stream
      val bySource = t(s, dir, "documents")
        .select(col("source"), explode(words(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
      val freqs = bySource.groupBy(col("tok"))
        .agg(sum(col("n")).as("freq"))
      // vocab cutoff via DistributedRank: range-partitioned cumsum,
      // total attached from phase 1 (no crossJoin re-evaluation)
      val vocab = graft.engine.DistributedRank(freqs,
        Seq(col("freq").desc, col("tok")),
        graft.engine.DistributedRank.Spec(valueCol = Some("freq"),
          cumCol = Some("cum"), totalCol = Some("total")))
        .filter((col("cum") - col("freq")) * 10 < col("total") * 9)
        .select(col("tok"), lit(1L).as("in_vocab"))
      bySource.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_tokens"),
          sum(when(col("in_vocab").isNull, col("n")).otherwise(0L))
            .as("n_oov"))
        .withColumn("oov_share",
          col("n_oov").cast("double") / col("n_tokens"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH st AS (
        SELECT source, tok, count(*) AS n
        FROM (SELECT source, unnest(${wordsSql("text")}) AS tok
              FROM documents)
        GROUP BY 1, 2),
      f AS (
        SELECT tok, CAST(SUM(n) AS BIGINT) AS freq FROM st GROUP BY tok),
      tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM f),
      r AS (
        SELECT tok, freq,
               CAST(SUM(freq) OVER (ORDER BY freq DESC, tok
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum
        FROM f),
      vocab AS (
        SELECT tok FROM r
        WHERE (cum - freq) * 10 < (SELECT total FROM tot) * 9)
      SELECT source,
             CAST(SUM(n) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN v.tok IS NULL THEN n ELSE 0 END) AS BIGINT)
               AS n_oov,
             CAST(SUM(CASE WHEN v.tok IS NULL THEN n ELSE 0 END) AS DOUBLE)
               / CAST(SUM(n) AS BIGINT) AS oov_share
      FROM st LEFT JOIN vocab v USING (tok)
      GROUP BY source ORDER BY source"""))

  /** Gini concentration of document mass across sources — the
    * inequality number a corpus-mixing plan starts from (one source
    * owning most of the mass is a diversity risk q_mixture_weights then
    * corrects). Computed from the sorted-rank identity
    * `G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ)` entirely in BIGINT
    * (ranks and char counts), one double division at the end.
    *
    * Scale: the corpus collapses to per-source mass first; the rank is
    * [[graft.engine.DistributedRank]] over the SOURCE relation — tiny
    * here, range-partitioned at a million groups. The Σ i·xᵢ
    * moment travels as DECIMAL(38,0) on the Spark side — rank × mass
    * exceeds 64 bits long before the char masses themselves do — and
    * the oracle casts the rank to HUGEINT before the product for the
    * same headroom; both sides round to double once, from the same
    * exact integers.
    */
  val qSourceGini = QueryDef(
    "q_source_gini",
    (s, dir) => {
      val mass = t(s, dir, "documents")
        .groupBy(col("source")).agg(sum(col("n_chars")).as("x"))
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      graft.engine.DistributedRank.rank(mass,
        Seq(col("x"), col("source")), "i")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(d38(col("i")) * d38(col("x"))).as("six"))
        .select(col("n"), col("sx"),
          ((d38(col("six")) * 2 - d38(col("n") + 1) * d38(col("sx")))
            .cast("double") /
            (d38(col("n")) * d38(col("sx"))).cast("double")).as("gini"))
    },
    Some("""
      WITH mass AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS x
        FROM documents GROUP BY source),
      rk AS (
        SELECT x, row_number() OVER (ORDER BY x, source) AS i FROM mass),
      agg AS (
        SELECT count(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
               SUM(CAST(i AS HUGEINT) * x) AS six
        FROM rk)
      SELECT n, sx,
             -- int64 hop before the double cast (q_covariance ulp):
             -- int128->double double-rounds past 2^53; int64->double
             -- matches Spark's Decimal->double, raises loudly past 2^63
             CAST(CAST(six * 2 - (n + 1) * sx AS BIGINT) AS DOUBLE)
               / CAST(CAST(n * sx AS BIGINT) AS DOUBLE) AS gini
      FROM agg"""))

  val all: Seq[QueryDef] = Seq(qSeqPack, qMixtureWeights, qCrossdocOverlap,
    qVocabCoverage, qBpePairs, qMaskSpans, qOovAudit, qSourceGini)
}
