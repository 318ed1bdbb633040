package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.functions.TextFunctions._

/** LLM-training-data pipeline operators over the `documents` table
  * (TESTDATA.md): exact + near-dup deduplication, document
  * fingerprinting, text analysis (tokens, quality, language-ID). The
  * reference has no such surface — these are the extension operators the
  * builder brief mandates (SURVEY §7.6), built Spark-first.
  *
  * Scale discipline: nothing here is all-pairs over the corpus. Near-dup
  * discovery goes shingle → signature → LSH band → bucket-join, so the
  * only quadratic work is WITHIN a bucket (the 100 TB design); the one
  * exact-jaccard query is explicitly restricted to a doc_id block and
  * exists to validate the probabilistic path, flagged bench=false.
  */
object DocQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  /** The tokenized corpus `(doc_id, ws: array<string>)` — the
    * "tokenizer pass landed once" every span-granular operator starts
    * from — session-materialized like [[HashedGrams]] (same fingerprint
    * keying and replacement eviction). [[qSpanDedup]] consumes the
    * relation on THREE plan branches (positional hashing, the
    * reconstruction token table, and the per-doc length base), and
    * exchange reuse cannot deduplicate them across its diverging
    * aggregates — without the cache each branch re-runs scan+split over
    * the whole corpus. Repartitioned on doc_id at build time so the
    * materialized layout takes the engine's width, not the input's
    * (HashedGrams rationale), and co-locates the per-doc joins.
    */
  private val wordsCache =
    new graft.engine.SessionKeyedCache[DataFrame](_.unpersist())

  private[queries] def tokenized(s: SparkSession, dir: String): DataFrame =
    wordsCache.getOrElseUpdate(s, dir,
      graft.engine.SessionKeyedCache.fileFingerprint(
        s, s"$dir/documents.parquet"))(
      docs(s, dir)
        .select(col("doc_id"), col("text"))
        // count pinned (round-18): an unpinned keyed repartition is
        // AQE-coalescible by shuffle BYTES, and once cached-plan AQE is
        // on (Bench conf) the kB-sized text proxy folds back to one
        // partition — freezing a SERIAL layout into the cache that
        // every downstream tokenization consumer inherits
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          graft.functions.TextFunctions.words(col("text")).as("ws"))
        .persist())

  /** Exact dedup via content hash: one row per distinct text, keeper =
    * lowest doc_id (the `ON CONFLICT` first-wins analogue for corpora).
    * At 100 TB this is the standard hash-groupBy: shuffles only
    * (hash, doc_id), never the text payload.
    */
  val qDedupExact = QueryDef(
    "q_dedup_exact",
    (s, dir) => docs(s, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("content_hash")),
    Some("""
      SELECT md5(text) AS content_hash, min(doc_id) AS keeper_doc_id,
             count(*) AS n_copies
      FROM documents GROUP BY md5(text) ORDER BY content_hash"""))

  /** 60-bit whitespace-normalized fingerprint per document (md5-derived;
    * robust to case/punctuation/extra-space variation).
    */
  val qDocFingerprint = QueryDef(
    "q_doc_fingerprint",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"),
        h60(array_join(words(col("text")), " ")).as("fingerprint"))
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             ${h60Sql(s"array_to_string(${wordsSql("text")}, ' ')")} AS fingerprint
      FROM documents ORDER BY doc_id"""))

  /** Near-dup discovery: distinct-word sets → k=12 MinHash signature →
    * 2 bands × 6 rows LSH → candidate pairs ONLY within band buckets →
    * signature-agreement filter (≥ 11/12 ≈ estimated Jaccard ≥ 0.92).
    * Never all-pairs: the band join is an equi-join on the band key, so
    * at scale work concentrates where near-dups actually are.
    */
  /** LSH candidate pairs with signature-agreement counts — the stage the
    * recall test exercises against exact Jaccard ground truth. Input: any
    * DataFrame with (doc_id, text).
    */
  /** (doc_id, sig, m, bkey) LSH band rows for any (doc_id, text) input —
    * the shared index unit of the batch pair-finder and the incremental
    * [[graft.engine.DedupGate]].
    */
  private[graft] def minhashBands(d: DataFrame): DataFrame = {
    val sig = d.select(col("doc_id"),
      minhashSig(array_distinct(words(col("text")))).as("sig"))
    val bandStructs = (0 until MinhashBands).map { m =>
      struct(lit(m).as("m"),
        md5(array_join(transform(slice(col("sig"), m * MinhashRows + 1, MinhashRows),
          x => x.cast("string")), ",")).as("bkey"))
    }
    sig.select(col("doc_id"), col("sig"),
      explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("sig"),
        col("band.m").as("m"), col("band.bkey").as("bkey"))
  }

  private[graft] def minhashCandidates(d: DataFrame): DataFrame = {
    val bands = minhashBands(d)
    val a = bands.select(col("m"), col("bkey"), col("doc_id").as("doc_a"),
      col("sig").as("sa"))
    val b = bands.select(col("m"), col("bkey"), col("doc_id").as("doc_b"),
      col("sig").as("sb"))
    a.join(b, Seq("m", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
      .distinct()
      // codegen agreement count — the HOF zip_with chain here was the
      // round-9 10× sweep's hottest finding (see MinHashAgree scaladoc:
      // it rides the band join's pushed-down bound condition)
      .withColumn("matches",
        graft.functions.MinHashAgree(col("sa"), col("sb")))
      .select(col("doc_a"), col("doc_b"), col("matches"))
  }

  val qDedupMinhash = QueryDef(
    "q_dedup_minhash",
    (s, dir) => minhashCandidates(docs(s, dir))
      .filter(col("matches") >= MinhashK - 1)
      .select(col("doc_a"), col("doc_b"),
        (col("matches").cast("double") / MinhashK).as("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b")),
    Some(minhashScoredCte + s"""
      SELECT doc_a, doc_b, CAST(matches AS DOUBLE) / $MinhashK AS est_jaccard
      FROM scored WHERE matches >= ${MinhashK - 1}
      ORDER BY doc_a, doc_b"""),
    bench = false)

  /** Oracle CTE chain ending in `scored(doc_a, doc_b, matches)` — the
    * SQL mirror of [[minhashCandidates]], shared by the pair and group
    * queries.
    */
  private lazy val minhashScoredCte: String = s"""
      WITH RECURSIVE ws AS (
        SELECT doc_id, list_distinct(${wordsSql("text")}) AS w FROM documents),
      sig AS (SELECT doc_id, ${minhashSigSql("w")} AS sig FROM ws),
      bands AS (
        SELECT doc_id, sig, m,
               md5(array_to_string(list_transform(
                 list_slice(sig, m * $MinhashRows + 1, (m + 1) * $MinhashRows),
                 x -> CAST(x AS VARCHAR)), ',')) AS bkey
        FROM sig, (SELECT unnest([${(0 until MinhashBands).mkString(", ")}]) AS m)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.sig AS sa, b.sig AS sb
        FROM bands a JOIN bands b ON a.m = b.m AND a.bkey = b.bkey
                                 AND a.doc_id < b.doc_id),
      scored AS (
        SELECT doc_a, doc_b,
               list_sum([CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END
                         for p in list_zip(sa, sb)]) AS matches
        FROM pairs)"""

  /** Transitive dup-group resolution: union the near-dup pairs into
    * connected components and label every member with the component's
    * minimum doc_id (the keeper). Distributed label propagation — each
    * round is one join + min-aggregate, state truncated per round — so
    * rounds cost O(edges) and the count is O(component diameter), NOT
    * O(corpus). The oracle computes the same fixpoint via a recursive
    * transitive-closure CTE.
    */
  /** Connected components over the near-dup graph by iterative min-label
    * propagation. Returns (doc_id, dup_group) for every doc that appears
    * in at least one near-dup pair; dup_group = component min doc_id.
    */
  /** [[dupGroups]] result cached per (session, canonicalized input
    * plan, input files) — both q_dedup_groups and q_corpus_clean need
    * it and the propagation loop is the expensive part. The
    * CANONICALIZED plan normalizes expression ids (a fresh
    * `spark.read` per call mints new ones), so identical inputs
    * actually hit — but its `toString` also erases the scan LOCATION,
    * so two same-schema corpora would collide on plan text alone (a
    * collision test in CurationSpec caught exactly that). The key
    * therefore also carries the concrete input-file listing, which
    * doubles as the append/compaction fingerprint: a rewritten table
    * mints new part files and misses instead of serving stale groups.
    */
  private val groupsCache = new graft.engine.SessionKeyedCache[DataFrame]

  private[graft] def dupGroups(d: DataFrame): DataFrame =
    // one-key form ON PURPOSE: the canonicalized plan erases the scan
    // location, so plan text alone is one shared prefix across
    // same-schema corpora — under the two-part key, two corpora
    // alternating in one session would evict (and recompute) each
    // other's propagation loop. Values are localCheckpoints (no
    // unpersist callback), so replacement-eviction buys nothing here.
    groupsCache.getOrElseUpdate(d.sparkSession,
      d.queryExecution.analyzed.canonicalized.toString +
        d.inputFiles.sorted.mkString("|"))(dupGroupsUncached(d))

  private def dupGroupsUncached(d: DataFrame): DataFrame = {
    val pairs = minhashCandidates(d)
      .filter(col("matches") >= MinhashK - 1)
      .select(col("doc_a"), col("doc_b"))
    val edges = pairs.union(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .persist()
    // The propagation loop itself is the shared components engine
    // (round 10 extraction — GraphQueries.components runs the same
    // code over the fulfillment graph); the "[dup-groups]" log tag is
    // kept because SCALE.md's convergence evidence cites it.
    try graft.engine.LabelPropagation.components(edges, "dup-groups")
      .select(col("node").as("doc_id"), col("label").as("dup_group"))
    finally { edges.unpersist(); () }
  }

  /** Oracle CTE chain extending [[minhashScoredCte]] with the recursive
    * connected-components fixpoint, ending in `groups(doc_id,
    * dup_group)` — shared by the group and corpus-clean oracles.
    */
  private[graft] lazy val dupGroupsCte: String = minhashScoredCte + s""",
      hits AS (SELECT doc_a, doc_b FROM scored WHERE matches >= ${MinhashK - 1}),
      edges AS (SELECT doc_a AS src, doc_b AS dst FROM hits
                UNION SELECT doc_b, doc_a FROM hits),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      nodes AS (SELECT DISTINCT src AS doc FROM edges),
      groups AS (
        SELECT n.doc AS doc_id, LEAST(n.doc, MIN(r.dst)) AS dup_group
        FROM nodes n JOIN reach r ON r.src = n.doc GROUP BY n.doc)"""

  val qDedupGroups = QueryDef(
    "q_dedup_groups",
    (s, dir) => dupGroups(docs(s, dir)).orderBy(col("doc_id")),
    Some(dupGroupsCte + """
      SELECT doc_id, dup_group FROM groups ORDER BY doc_id"""),
    bench = false)

  /** Per-document 32-bit SimHash (set-semantics) — hamming-adjacent docs
    * are near-dups; banding the 4 bytes gives the standard ≤3-bit-distance
    * blocking at scale.
    */
  val qDedupSimhash = QueryDef(
    "q_dedup_simhash",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"),
        transform(array_distinct(words(col("text"))), w => h44(w)).as("hs"))
      .select(col("doc_id"), simhash32("hs").as("simhash"))
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id, ${simhash32Sql("hs")} AS simhash
      FROM (SELECT doc_id,
              list_transform(list_distinct(${wordsSql("text")}),
                w -> ${h44Sql("w")}) AS hs
            FROM documents)
      ORDER BY doc_id"""))

  /** Exact n-gram (unigram-set) Jaccard over a bounded doc_id block —
    * the ground-truth validator for the MinHash path. Deliberately
    * restricted (all-pairs is not a scale design; bench=false).
    */
  val qNgramJaccard = QueryDef(
    "q_ngram_jaccard",
    (s, dir) => {
      val sets = boundedWordSets(docs(s, dir))
      val a = sets.select(col("doc_id").as("doc_a"), col("ws").as("wa"))
      val b = sets.select(col("doc_id").as("doc_b"), col("ws").as("wb"))
      a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("wa"), col("wb"))).cast("bigint").as("inter_size"),
          size(array_union(col("wa"), col("wb"))).cast("bigint").as("union_size"))
        .withColumn("jaccard",
          col("inter_size").cast("double") / col("union_size"))
        .filter(col("jaccard") >= 0.8)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(boundedSetsCte + s"""
      SELECT doc_a, doc_b, inter_size, union_size,
             CAST(inter_size AS DOUBLE) / union_size AS jaccard
      FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS inter_size,
               CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS BIGINT) AS union_size
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id)
      WHERE CAST(inter_size AS DOUBLE) / union_size >= 0.8
      ORDER BY doc_a, doc_b"""),
    bench = false)

  /** Bounded distinct-word sets shared by the exact-similarity
    * validators. Zero-word docs are excluded on BOTH sides — they would
    * divide by zero, and Spark NaN vs DuckDB NULL disagree on `>=`.
    */
  private def boundedWordSets(d: DataFrame): DataFrame =
    d.filter(col("doc_id") < 100)
      .select(col("doc_id"), array_distinct(words(col("text"))).as("ws"))
      .filter(size(col("ws")) >= 1)

  private lazy val boundedSetsCte: String = s"""
      WITH sets AS (
        SELECT doc_id, ws FROM (
          SELECT doc_id, list_distinct(${wordsSql("text")}) AS ws
          FROM documents WHERE doc_id < 100)
        WHERE len(ws) >= 1)"""

  /** Directional containment |A∩B| / |A| — catches sub-document
    * duplication (a doc embedded in a larger one) that symmetric Jaccard
    * under-scores. Bounded validator like [[qNgramJaccard]]
    * (bench=false); the scale path blocks by LSH buckets first.
    */
  val qContainment = QueryDef(
    "q_containment",
    (s, dir) => {
      val sets = boundedWordSets(docs(s, dir))
      val a = sets.select(col("doc_id").as("doc_sub"), col("ws").as("wa"))
      val b = sets.select(col("doc_id").as("doc_super"), col("ws").as("wb"))
      a.crossJoin(b).filter(col("doc_sub") =!= col("doc_super"))
        .select(col("doc_sub"), col("doc_super"),
          size(array_intersect(col("wa"), col("wb"))).cast("bigint").as("inter_size"),
          size(col("wa")).cast("bigint").as("sub_size"))
        .withColumn("containment",
          col("inter_size").cast("double") / col("sub_size"))
        .filter(col("containment") >= 0.95)
        .orderBy(col("doc_sub"), col("doc_super"))
    },
    Some(boundedSetsCte + s"""
      SELECT doc_sub, doc_super, inter_size, sub_size,
             CAST(inter_size AS DOUBLE) / sub_size AS containment
      FROM (
        SELECT a.doc_id AS doc_sub, b.doc_id AS doc_super,
               CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS inter_size,
               CAST(len(a.ws) AS BIGINT) AS sub_size
        FROM sets a JOIN sets b ON a.doc_id <> b.doc_id)
      WHERE CAST(inter_size AS DOUBLE) / sub_size >= 0.95
      ORDER BY doc_sub, doc_super"""),
    bench = false)

  /** Corpus rollup per (lang, source): doc counts, token totals, exact
    * average chars — the A5/A6 aggregate shapes over text features.
    */
  val qTextStats = QueryDef(
    "q_text_stats",
    (s, dir) => docs(s, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        size(words(col("text"))).cast("bigint").as("n_words"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        max(col("n_words")).as("max_words"))
      .orderBy(col("lang"), col("source")),
    Some(s"""
      SELECT lang, source, count(*) AS n_docs,
             CAST(SUM(n_words) AS BIGINT) AS total_words,
             CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars,
             MAX(n_words) AS max_words
      FROM (SELECT lang, source, n_chars,
              CAST(len(${wordsSql("text")}) AS BIGINT) AS n_words
            FROM documents)
      GROUP BY lang, source ORDER BY lang, source"""))

  /** Whitespace + BPE-ish regex token counting per document (F-surface:
    * token budgeting for training-data pipelines).
    */
  val qTokenCount = QueryDef(
    "q_token_count",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"),
        size(words(col("text"))).cast("bigint").as("n_words"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("bigint").as("n_tokens"))
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             CAST(len(${wordsSql("text")}) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens
      FROM documents ORDER BY doc_id"""))

  private val stopwords = Seq("the", "a", "of", "and", "in", "to")
  private val stopwordsSqlList = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Shared quality scoring: (doc_id, word_cnt, ttr, stop_ratio, score)
    * with zero-word guards (NULL, not a NaN/NULL cross-engine split).
    * One definition for both qQualityScore and qCorpusClean.
    */
  private[graft] def scoredQuality(d: DataFrame): DataFrame =
    d.select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("bigint").as("word_cnt"),
        expr(s"size(filter(ws, w -> w IN $stopwordsSqlList))")
          .cast("bigint").as("stop_cnt"),
        size(array_distinct(col("ws"))).cast("bigint").as("distinct_cnt"))
      .select(col("doc_id"), col("word_cnt"),
        when(col("word_cnt") > 0,
          col("distinct_cnt").cast("double") / col("word_cnt")).as("ttr"),
        when(col("word_cnt") > 0,
          col("stop_cnt").cast("double") / col("word_cnt")).as("stop_ratio"))
      .withColumn("score",
        lit(0.5) * col("ttr") + lit(0.5) * (lit(1.0) - col("stop_ratio")))

  /** SQL mirror of [[scoredQuality]], ending in
    * `scoredq(doc_id, word_cnt, ttr, stop_ratio, score)`. No leading
    * WITH — embeds in any CTE chain.
    */
  private lazy val qualityCteBody: String = s"""
      qf AS (
        SELECT doc_id,
               CAST(len(qws) AS BIGINT) AS word_cnt,
               CAST(len(list_filter(qws, w -> w IN $stopwordsSqlList)) AS BIGINT) AS stop_cnt,
               CAST(len(list_distinct(qws)) AS BIGINT) AS distinct_cnt
        FROM (SELECT doc_id, ${wordsSql("text")} AS qws FROM documents)),
      qr AS (
        SELECT doc_id, word_cnt,
               CASE WHEN word_cnt > 0
                    THEN CAST(distinct_cnt AS DOUBLE) / word_cnt END AS ttr,
               CASE WHEN word_cnt > 0
                    THEN CAST(stop_cnt AS DOUBLE) / word_cnt END AS stop_ratio
        FROM qf),
      scoredq AS (
        SELECT doc_id, word_cnt, ttr, stop_ratio,
               0.5 * ttr + 0.5 * (1.0 - stop_ratio) AS score
        FROM qr)"""

  /** Heuristic quality scoring: type-token ratio, stopword ratio, and a
    * blended score — the standard cheap filters in front of expensive
    * training-data stages.
    */
  val qQualityScore = QueryDef(
    "q_quality_score",
    (s, dir) => scoredQuality(docs(s, dir)).orderBy(col("doc_id")),
    Some(s"""
      WITH $qualityCteBody
      SELECT doc_id, word_cnt, ttr, stop_ratio, score
      FROM scoredq ORDER BY doc_id"""))

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  /** Stopword-profile language ID (n-gram-heuristic family): score each
    * language by marker-token frequency, argmax with fixed precedence,
    * 'und' when nothing matches. On this synthetic corpus (shared
    * vocabulary across lang labels) it mostly resolves to 'en'/'und' —
    * the OPERATOR is the deliverable; the data has no real language
    * signal (documented).
    */
  val qLangId = QueryDef(
    "q_lang_id",
    (s, dir) => {
      val scored = langMarkers.foldLeft(
        docs(s, dir).select(col("doc_id"), col("lang"), words(col("text")).as("ws"))) {
        case (df, (l, ms)) =>
          val set = ms.map(w => s"'$w'").mkString("(", ", ", ")")
          df.withColumn(s"s_$l",
            expr(s"size(filter(ws, w -> w IN $set))").cast("bigint"))
      }
      val langs = langMarkers.map(_._1)
      val best = greatest(langs.map(l => col(s"s_$l")): _*)
      val predicted = langs.foldRight(lit("und")) { case (l, els) =>
        when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(els)
      }
      scored.withColumn("predicted", predicted)
        .select((Seq(col("doc_id"), col("lang"), col("predicted")) ++
          langs.map(l => col(s"s_$l"))): _*)
        .orderBy(col("doc_id"))
    },
    Some({
      val scoreExprs = langMarkers.map { case (l, ms) =>
        val set = ms.map(w => s"'$w'").mkString("(", ", ", ")")
        s"CAST(len(list_filter(ws, w -> w IN $set)) AS BIGINT) AS s_$l"
      }.mkString(",\n               ")
      val langs = langMarkers.map(_._1)
      val best = langs.map(l => s"s_$l").reduce((x, y) => s"greatest($x, $y)")
      val predicted = langs.foldRight("'und'") { case (l, els) =>
        s"CASE WHEN s_$l = best AND best > 0 THEN '$l' ELSE $els END"
      }
      s"""
      WITH f AS (
        SELECT doc_id, lang,
               $scoreExprs
        FROM (SELECT doc_id, lang, ${wordsSql("text")} AS ws FROM documents)),
      g AS (SELECT *, $best AS best FROM f)
      SELECT doc_id, lang, $predicted AS predicted,
             ${langs.map(l => s"s_$l").mkString(", ")}
      FROM g ORDER BY doc_id"""
    }))

  /** The training-data pipeline END PRODUCT: quality gate → exact-dup
    * keeper → near-dup-group keeper, in one composed plan. A document
    * survives iff its quality score ≥ 0.65 with ≥ 20 words, it is the
    * lowest doc_id for its exact content hash, and it is its near-dup
    * component's representative (or in no component). Output is the
    * clean corpus roster with token counts — what a 100 TB curation run
    * would hand to tokenization.
    */
  val qCorpusClean = QueryDef(
    "q_corpus_clean",
    (s, dir) => {
      val d = docs(s, dir)
      val exactKeepers = d.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).drop("h")
      scoredQuality(d)
        .filter(col("score") >= 0.65 && col("word_cnt") >= 20)
        .join(exactKeepers, Seq("doc_id"), "left_semi")
        .join(dupGroups(d), Seq("doc_id"), "left")
        .filter(col("dup_group").isNull || col("dup_group") === col("doc_id"))
        .select(col("doc_id"), col("word_cnt").as("n_words"))
        .orderBy(col("doc_id"))
    },
    Some(dupGroupsCte + "," + qualityCteBody + """,
      keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
      SELECT q.doc_id, q.word_cnt AS n_words
      FROM scoredq q
      JOIN keepers k ON k.doc_id = q.doc_id
      LEFT JOIN groups g ON g.doc_id = q.doc_id
      WHERE q.score >= 0.65 AND q.word_cnt >= 20
        AND (g.dup_group IS NULL OR g.dup_group = q.doc_id)
      ORDER BY q.doc_id"""),
    bench = false)

  /** F-surface breadth: case, substring, replace, reverse, edit
    * distance — the string toolbox of fuzzy matching / normalization
    * stages, each verified to behave identically in both engines.
    */
  val qStringFuncs = QueryDef(
    "q_string_funcs",
    (s, dir) => docs(s, dir).filter(col("doc_id") < 50)
      .select(col("doc_id"),
        substring(col("text"), 1, 20).as("prefix"))
      .select(col("doc_id"), col("prefix"),
        upper(col("prefix")).as("prefix_upper"),
        regexp_replace(col("prefix"), "a", "@").as("prefix_sub"),
        reverse(col("prefix")).as("prefix_rev"),
        levenshtein(col("prefix"), reverse(col("prefix"))).cast("int")
          .as("lev_to_rev"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, prefix,
             upper(prefix) AS prefix_upper,
             replace(prefix, 'a', '@') AS prefix_sub,
             reverse(prefix) AS prefix_rev,
             CAST(levenshtein(prefix, reverse(prefix)) AS INTEGER) AS lev_to_rev
      FROM (SELECT doc_id, substr(text, 1, 20) AS prefix
            FROM documents WHERE doc_id < 50)
      ORDER BY doc_id"""))

  /** TF-IDF term weighting (linear-idf variant): score = tf × N/df
    * computed as ONE exact-integer ratio converted to double at the end.
    * The log-idf form is deliberately avoided: Spark's `ln` (Java
    * Math.log) and DuckDB's libm `ln` differ in the last ulp (measured),
    * which would break the bit-exact oracle gate — the linear variant
    * ranks identically within a corpus.
    */
  val qTfidf = QueryDef(
    "q_tfidf",
    (s, dir) => {
      val subset = docs(s, dir).filter(col("doc_id") < 100)
      val terms = subset.select(col("doc_id"),
        explode(words(col("text"))).as("word"))
      val cnt = terms.groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("cnt"))
      val docTotals = cnt.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("word_cnt"))
      val dfCounts = cnt.groupBy(col("word"))
        .agg(count(lit(1)).as("df"))
      val n = subset.agg(count(lit(1)).as("n_docs"))
      cnt.join(docTotals, Seq("doc_id"))
        .join(dfCounts, Seq("word"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("word"), col("cnt"),
          ((col("cnt") * col("n_docs")).cast("double") /
            (col("word_cnt") * col("df"))).as("tfidf_lin"))
        .orderBy(col("doc_id"), col("word"))
    },
    Some(s"""
      WITH terms AS (
        SELECT doc_id, unnest(${wordsSql("text")}) AS word
        FROM documents WHERE doc_id < 100),
      cnt AS (
        SELECT doc_id, word, count(*) AS cnt FROM terms GROUP BY doc_id, word),
      doc_totals AS (
        SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS word_cnt FROM cnt GROUP BY doc_id),
      dfc AS (SELECT word, count(*) AS df FROM cnt GROUP BY word),
      n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id < 100)
      SELECT c.doc_id, c.word, c.cnt,
             CAST(c.cnt * n.n_docs AS DOUBLE) / (t.word_cnt * d.df) AS tfidf_lin
      FROM cnt c JOIN doc_totals t USING(doc_id) JOIN dfc d USING(word), n
      ORDER BY doc_id, word"""),
    bench = false)

  /** Top-5 word bigrams per language label, deterministic tie-break —
    * the n-gram frequency rollup of corpus analysis.
    */
  val qNgramFreq = QueryDef(
    "q_ngram_freq",
    (s, dir) => {
      // size >= 2 guard on BOTH sides: Spark's sequence(1, 0) descends
      // instead of being empty (DuckDB's range(1, 1) IS empty), so a
      // one-word doc would throw INVALID_ARRAY_INDEX here.
      val bigrams = docs(s, dir)
        .select(col("lang"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("lang"), explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
          .as("bigram"))
      val counts = bigrams.groupBy(col("lang"), col("bigram"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("cnt").desc, col("bigram"))
      counts.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk"), col("bigram"), col("cnt"))
        .orderBy(col("lang"), col("rk"))
    },
    Some(s"""
      WITH b AS (
        SELECT lang, unnest([ws[i] || ' ' || ws[i + 1]
                             for i in range(1, len(ws))]) AS bigram
        FROM (SELECT lang, ${wordsSql("text")} AS ws FROM documents)
        WHERE len(ws) >= 2),
      c AS (SELECT lang, bigram, count(*) AS cnt FROM b GROUP BY lang, bigram)
      SELECT lang, rk, bigram, cnt FROM (
        SELECT *, row_number() OVER (
          PARTITION BY lang ORDER BY cnt DESC, bigram) AS rk
        FROM c)
      WHERE rk <= 5 ORDER BY lang, rk"""))

  /** Per-document QUANTIZED SURPRISAL under a self-trained bigram LM —
    * the perplexity-style quality filter (CCNet's KenLM gate) made
    * hash-exact: each transition u→v costs
    * `floor(log2 c(u)) − floor(log2 c(u,v))` bits, where both logs are
    * the INTEGER `length(bin(count)) − 1` (no floating log anywhere, so
    * Spark and DuckDB agree bit-for-bit; c(u,v) ≤ c(u) keeps every term
    * ≥ 0). High bits-per-transition = improbable word sequences = the
    * docs a perplexity gate drops.
    *
    * Scale: the WordCount family. Per-doc transition counts aggregate
    * WITHOUT a shuffle (tokenized() is doc_id-partitioned and doc_id
    * leads the grouping key); the global unigram/bigram models are one
    * map-side-combined aggregate each; scoring joins the per-doc
    * DISTINCT pair table (not raw transitions) against the models —
    * every join key-parallel, nothing driver-side, no |corpus|² term.
    */
  val qLmSurprisal = QueryDef(
    "q_lm_surprisal",
    (s, dir) => {
      val toks = tokenized(s, dir).filter(size(col("ws")) >= 2)
      // (doc_id, u, v, k): transition multiplicities per doc — the
      // grouping starts with doc_id, so the doc-partitioned input
      // aggregates shuffle-free
      // The per-doc transition table feeds TWO branches (the global
      // bigram model and the scoring join), and both executed the
      // transform+explode+aggregate twice — materialize it once as an
      // eager localCheckpoint leaf (round 19; the span-dedup `occ`
      // rationale, same double-reference shape).
      val tr = toks.select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
          |  i -> struct(element_at(ws, i) AS u,
          |              element_at(ws, i + 1) AS v))"""
          .stripMargin.replace('\n', ' '))).as("p"))
        .groupBy(col("doc_id"), col("p.u").as("u"), col("p.v").as("v"))
        .agg(count(lit(1)).as("k"))
        .localCheckpoint()
      val uni = tokenized(s, dir)
        .select(explode(col("ws")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      val big = tr.groupBy(col("u"), col("v")).agg(sum(col("k")).as("cb"))
      def flog2(c: Column): Column = (length(bin(c)) - 1).cast("long")
      tr.join(uni.withColumnRenamed("w", "u"), Seq("u"))
        .join(big, Seq("u", "v"))
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).as("transitions"),
          sum(col("k") * (flog2(col("cu")) - flog2(col("cb"))))
            .as("surprisal_bits"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, ws FROM
          (SELECT doc_id, ${wordsSql("text")} AS ws FROM documents)
        WHERE len(ws) >= 2),
      tr AS (
        SELECT doc_id, ws[i] AS u, ws[i + 1] AS v
        FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM toks)),
      uni AS (
        SELECT w, count(*) AS cu
        FROM (SELECT unnest(${wordsSql("text")}) AS w FROM documents)
        GROUP BY w),
      big AS (SELECT u, v, count(*) AS cb FROM tr GROUP BY u, v)
      SELECT tr.doc_id,
             CAST(COUNT(*) AS BIGINT) AS transitions,
             CAST(SUM((len(bin(uni.cu)) - 1) - (len(bin(big.cb)) - 1))
                  AS BIGINT) AS surprisal_bits
      FROM tr
      JOIN uni ON uni.w = tr.u
      JOIN big ON big.u = tr.u AND big.v = tr.v
      GROUP BY tr.doc_id ORDER BY tr.doc_id"""))

  /** Overlapping fixed-size character chunking — the tokenizer-prep
    * step of every training pipeline (long doc → stride-150 windows of
    * 200 chars). One Generate per doc, chunk count linear in doc length;
    * no shuffle at all — chunking is a map-side op whatever the corpus
    * size. Chunk ids are (doc_id, chunk_idx), deterministic for
    * downstream joins.
    */
  val qDocChunks = QueryDef(
    "q_doc_chunks",
    (s, dir) => docs(s, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        explode(expr("sequence(0, cast(floor((length(text) - 1) / 150) as int))"))
          .as("chunk_idx"), col("text"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        expr("substr(text, chunk_idx * 150 + 1, 200)").as("chunk"))
      .withColumn("chunk_chars", length(col("chunk")).cast("long"))
      .drop("text")
      .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""
      SELECT doc_id, chunk_idx,
             substr(text, CAST(chunk_idx * 150 + 1 AS INTEGER), 200) AS chunk,
             CAST(length(substr(text, CAST(chunk_idx * 150 + 1 AS INTEGER), 200)) AS BIGINT) AS chunk_chars
      FROM (
        SELECT doc_id, text,
               unnest(range(0, (length(text) - 1) // 150 + 1)) AS chunk_idx
        FROM documents WHERE length(text) > 0)
      ORDER BY doc_id, chunk_idx"""))

  /** Per-document repetition ratio (top-bigram share of all bigrams) —
    * the Gopher-style repetitiousness filter: boilerplate and generated
    * spam score high, natural text low. Shuffles (doc_id, bigram) pairs
    * once; both aggregations are partial-final hash aggregates keyed by
    * doc, so the op scales with corpus size, not vocabulary.
    */
  val qRepetition = QueryDef(
    "q_repetition",
    (s, dir) => {
      val bigrams = docs(s, dir)
        .select(col("doc_id"), words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
          .as("bigram"))
      bigrams.groupBy(col("doc_id"), col("bigram"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("total_bigrams"))
        .select(col("doc_id"), col("top_cnt"),
          col("total_bigrams").cast("long").as("total_bigrams"),
          (col("top_cnt").cast("double") / col("total_bigrams")).as("rep_ratio"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH b AS (
        SELECT doc_id, unnest([ws[i] || ' ' || ws[i + 1]
                               for i in range(1, len(ws))]) AS bigram
        FROM (SELECT doc_id, ${wordsSql("text")} AS ws FROM documents)
        WHERE len(ws) >= 2),
      c AS (SELECT doc_id, bigram, count(*) AS cnt FROM b GROUP BY doc_id, bigram)
      SELECT doc_id, max(cnt) AS top_cnt,
             CAST(sum(cnt) AS BIGINT) AS total_bigrams,
             CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS BIGINT) AS rep_ratio
      FROM c GROUP BY doc_id ORDER BY doc_id"""))

  /** Canonical-document election per near-dup group: highest quality
    * score wins, lowest doc_id breaks ties (exact dups share identical
    * scores). The alternative corpus-clean policy — q_corpus_clean keeps
    * the group MINIMUM id; real curation keeps the BEST copy. Window is
    * partitioned by dup_group (data-scaled key, no global funnel).
    */
  val qCanonicalDocs = QueryDef(
    "q_canonical_docs",
    (s, dir) => {
      val d = docs(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dup_group"))
        .orderBy(col("score").desc, col("doc_id"))
      dupGroups(d)
        .join(scoredQuality(d).select(col("doc_id"), col("score")), Seq("doc_id"))
        .withColumn("rk", row_number().over(w))
        .withColumn("n_members", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("dup_group"))))
        .filter(col("rk") === 1)
        .select(col("dup_group"), col("doc_id").as("canonical_doc"),
          col("score").as("canonical_score"), col("n_members"))
        .orderBy(col("dup_group"))
    },
    Some(dupGroupsCte + "," + qualityCteBody + """
      SELECT dup_group, doc_id AS canonical_doc, score AS canonical_score,
             n_members
      FROM (
        SELECT g.dup_group, g.doc_id, q.score,
               row_number() OVER (PARTITION BY g.dup_group
                                  ORDER BY q.score DESC, g.doc_id) AS rk,
               count(*) OVER (PARTITION BY g.dup_group) AS n_members
        FROM groups g JOIN scoredq q ON q.doc_id = g.doc_id)
      WHERE rk = 1 ORDER BY dup_group"""),
    bench = false)

  /** Rare-token ratio — the corpus-statistics quality signal the
    * per-document heuristics (q_quality_score) cannot see: the share of
    * a document's tokens whose corpus document-frequency is below 10%
    * of the corpus. High rare-ratio docs are jargon/gibberish/OOV-heavy
    * — the cheap stand-in for a perplexity filter that needs no model.
    * (On this synthetic 31-word vocabulary only 'dup' qualifies as rare
    * — the OPERATOR is the deliverable, as with q_lang_id.)
    *
    * All thresholding is integer (`doc_freq * 10 < n_docs`); the one
    * double appears in the final ratio division, identical in both
    * engines.
    *
    * Scale: tokens are pre-aggregated to (doc_id, token, n) with
    * map-side combine BEFORE any join, so the shuffle carries distinct
    * pairs, not the raw token stream; document frequency reuses that
    * same pair relation. The DF join is vocabulary-keyed — by Zipf the
    * pair relation is dominated by common tokens, but the join key
    * cardinality is the vocabulary, and AQE's skew split handles the
    * head tokens. n_docs is a broadcast scalar.
    */
  val qRareTokenRatio = QueryDef(
    "q_rare_token_ratio",
    (s, dir) => {
      val d = docs(s, dir)
      val total = d.agg(count(lit(1)).as("n_docs"))
      val perDoc = d
        .select(col("doc_id"), explode(words(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
      val dfreq = perDoc.groupBy(col("tok"))
        .agg(count(lit(1)).as("doc_freq"))
      perDoc.join(dfreq, Seq("tok"))
        .crossJoin(broadcast(total))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_tokens"),
          sum(when(col("doc_freq") * 10 < col("n_docs"), col("n"))
            .otherwise(0L)).as("n_rare"))
        .withColumn("rare_ratio",
          col("n_rare").cast("double") / col("n_tokens"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH pd AS (
        SELECT doc_id, tok, count(*) AS n
        FROM (SELECT doc_id, unnest(${wordsSql("text")}) AS tok FROM documents)
        GROUP BY 1, 2),
      dfq AS (SELECT tok, count(*) AS doc_freq FROM pd GROUP BY tok),
      tot AS (SELECT count(*) AS n_docs FROM documents)
      SELECT doc_id,
             CAST(SUM(n) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN doc_freq * 10 < (SELECT n_docs FROM tot)
                           THEN n ELSE 0 END) AS BIGINT) AS n_rare,
             CAST(SUM(CASE WHEN doc_freq * 10 < (SELECT n_docs FROM tot)
                           THEN n ELSE 0 END) AS DOUBLE)
               / CAST(SUM(n) AS BIGINT) AS rare_ratio
      FROM pd JOIN dfq USING (tok)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Boilerplate template detection: documents sharing an identical
    * 40-character opening are template instances (scraped headers,
    * license preambles, mirrored navigation) — the complement of
    * whole-document dedup that catches families exact AND near-dup
    * hashing both miss when the tails diverge. Grouping is by md5 of
    * the prefix, so only a 16-byte key ever shuffles, never the text.
    *
    * Scale: one hash aggregate on the prefix digest; members are
    * summarized (count + id range), not collected — no per-group list
    * state.
    */
  val qTemplatePrefix = QueryDef(
    "q_template_prefix",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"),
        md5(substring(col("text"), 1, 40)).as("prefix_md5"))
      .groupBy(col("prefix_md5"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("prefix_md5")),
    Some("""
      SELECT md5(substr(text, 1, 40)) AS prefix_md5, count(*) AS n_docs,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM documents GROUP BY 1 HAVING count(*) > 1
      ORDER BY prefix_md5"""))

  /** Token co-occurrence lift (collocation mining): for every token
    * pair, how much more often they share a document than independence
    * predicts — `lift = n_ab·N / (n_a·n_b)` — the log-free core of PMI
    * and the signal behind phrase detection and related-term mining.
    * Counts are exact document frequencies; the single double is the
    * final lift division of two BIGINT products.
    *
    * Scale: pairs come from a doc-keyed self-join of the DISTINCT
    * (doc, token) relation — quadratic only in per-document distinct
    * tokens (bounded by doc length), aggregating straight into the
    * vocabulary² matrix. At corpus scale the standard cutoffs apply
    * first (drop DF-1 tokens, cap per-doc distinct tokens) — both are
    * pre-filters on the pair source, not post-hoc.
    */
  val qCooccurrence = QueryDef(
    "q_cooccurrence",
    (s, dir) => {
      val d = docs(s, dir)
      val total = d.agg(count(lit(1)).as("n_docs"))
      val dt = d.select(col("doc_id"),
        explode(array_distinct(words(col("text")))).as("tok"))
      val nx = dt.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val pairs = dt.as("a")
        .join(dt.as("b"), Seq("doc_id"))
        .filter(col("a.tok") < col("b.tok"))
        .groupBy(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
        .agg(count(lit(1)).as("n_ab"))
      // lift factors as DECIMAL(38,0): count × corpus-size products
      // overflow 64 bits at web scale under ANSI; both engines round to
      // double once from the same exact integers
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      pairs
        .join(nx.select(col("tok").as("tok_a"), col("n").as("n_a")), Seq("tok_a"))
        .join(nx.select(col("tok").as("tok_b"), col("n").as("n_b")), Seq("tok_b"))
        .crossJoin(broadcast(total))
        .select(col("tok_a"), col("tok_b"), col("n_ab"), col("n_a"), col("n_b"),
          ((d38(col("n_ab")) * d38(col("n_docs"))).cast("double") /
            (d38(col("n_a")) * d38(col("n_b"))).cast("double")).as("lift"))
        .orderBy(col("tok_a"), col("tok_b"))
    },
    Some(s"""
      WITH dt AS (
        SELECT doc_id, unnest(list_distinct(ws)) AS tok
        FROM (SELECT doc_id, ${wordsSql("text")} AS ws FROM documents)),
      nx AS (SELECT tok, count(*) AS n FROM dt GROUP BY tok),
      tot AS (SELECT count(*) AS n_docs FROM documents),
      p AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2)
      SELECT tok_a, tok_b, n_ab, na.n AS n_a, nb.n AS n_b,
             -- int64 hop before the double cast: DuckDB's
             -- int128->double double-rounds past 2^53 (the
             -- q_covariance ulp); int64->double matches Spark's
             -- correctly-rounded Decimal->double, and raises loudly
             -- past 2^63 instead of silently drifting
             CAST(CAST(CAST(n_ab AS HUGEINT) * (SELECT n_docs FROM tot)
                       AS BIGINT) AS DOUBLE)
               / CAST(CAST(CAST(na.n AS HUGEINT) * nb.n AS BIGINT)
                      AS DOUBLE) AS lift
      FROM p JOIN nx na ON na.tok = p.tok_a
             JOIN nx nb ON nb.tok = p.tok_b
      ORDER BY tok_a, tok_b"""))

  /** Exact substring-span deduplication (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" exact
    * operator, word-granular): every 8-token span is hashed at every
    * position; a span occurring more than once in the corpus keeps only
    * its first occurrence — ordered by (doc_id, pos) — and every other
    * occurrence is masked; documents are rewritten with masked token
    * positions removed. Complements the set-level near-dup family
    * ([[qDedupMinhash]]/[[qDedupSimhash]]): those drop whole documents,
    * this surgically removes repeated boilerplate/quotation spans INSIDE
    * otherwise-unique documents (including within-document repetition).
    *
    * Scale: the positional gram relation shuffles on the 44-bit span
    * hash only (one row per token position — the same O(tokens) size as
    * any tokenizer pass, built by the codegen'd
    * [[graft.functions.SpanHashes]], never materializing gram strings).
    * Canonical election is a mergeable min(struct(doc_id,pos))
    * aggregate, skew-safe where a window-over-gh would serialize on
    * boilerplate spans. Only DUPLICATED occurrences fan out into token
    * positions (×8 on the dup fraction, not the corpus), and document
    * reconstruction is a per-doc sorted rollup whose state is bounded by
    * document length.
    */
  val qSpanDedup = QueryDef(
    "q_span_dedup",
    (s, dir) => {
      val W = 8
      val toks = tokenized(s, dir).filter(size(col("ws")) >= W)
      // The positional gram relation feeds TWO plan branches (the
      // canonical-election aggregate and the occurrence join), and the
      // branches executed the SpanHashes projection twice — the
      // query's single most expensive leaf (round-19 profile: ~40% of
      // its 43 executor-seconds). Materialize it once as an eager
      // localCheckpoint leaf; both branches then scan the stored rows.
      // A window-over-gh would also single-pass it but serializes on
      // boilerplate spans (the scaladoc's skew argument) — the leaf
      // keeps the mergeable aggregate + join shape.
      val occ = toks.select(col("doc_id"),
        posexplode(graft.functions.SpanHashes(col("ws"), W))
          .as(Seq("pos", "gh")))
        .localCheckpoint()
      val firsts = occ.groupBy(col("gh")).agg(
        count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("c0"))
      // only duplicated grams can mask anything — filtering the agg side
      // BEFORE the join shrinks its probe table to the dup sliver (the
      // inner join then drops unique-gram occurrences by construction)
      val masked = occ.join(firsts.filter(col("cnt") > 1), Seq("gh"))
        .filter(!(col("doc_id") === col("c0.doc_id") &&
          col("pos") === col("c0.pos")))
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + lit(W - 1))).as("tp"))
        .distinct()
      // reconstruction touches ONLY docs that lost a span — on a
      // mostly-unique corpus the token-level anti-join and per-doc
      // rollup run over the dup-affected sliver, not the corpus
      val maskedDocs = masked.select(col("doc_id")).distinct()
      val base = toks.join(maskedDocs, Seq("doc_id"), "left_semi")
      val tokRows = base.select(col("doc_id"),
        posexplode(col("ws")).as(Seq("tp", "tok")))
      val kept = tokRows.join(masked, Seq("doc_id", "tp"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(
            array_sort(collect_list(struct(col("tp"), col("tok")))),
            x => x.getField("tok")), " ").as("kept_text"))
      base.select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"))
        .join(kept, Seq("doc_id"), "left")
        .withColumn("n_removed",
          col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
        .filter(col("n_removed") > 0)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          coalesce(col("kept_text"), lit("")).as("kept_text"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH w AS (SELECT doc_id, ${wordsSql("text")} AS ws FROM documents),
      e AS (SELECT doc_id, ws FROM w WHERE len(ws) >= 8),
      occ AS (
        SELECT doc_id,
               unnest(range(0, len(ws) - 7)) AS pos,
               unnest([${h44Sql("array_to_string(ws[i:i+7], ' ')")}
                       for i in range(1, len(ws) - 6)]) AS gh
        FROM e),
      f AS (SELECT gh, count(*) AS cnt,
                   min({'doc_id': doc_id, 'pos': pos}) AS c0
            FROM occ GROUP BY gh),
      m AS (SELECT DISTINCT doc_id, tp FROM (
              SELECT occ.doc_id, unnest(range(occ.pos, occ.pos + 8)) AS tp
              FROM occ JOIN f USING (gh)
              WHERE f.cnt > 1
                AND NOT (occ.doc_id = struct_extract(f.c0, 'doc_id')
                         AND occ.pos = struct_extract(f.c0, 'pos')))),
      tok AS (SELECT doc_id, unnest(range(0, len(ws))) AS tp,
                     unnest(ws) AS tok
              FROM e),
      kept AS (SELECT doc_id, count(*) AS n_kept,
                      string_agg(tok, ' ' ORDER BY tp) AS kept_text
               FROM tok ANTI JOIN m USING (doc_id, tp) GROUP BY doc_id),
      base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM e)
      SELECT base.doc_id, base.n_tokens,
             base.n_tokens - coalesce(kept.n_kept, 0) AS n_removed,
             coalesce(kept.kept_text, '') AS kept_text
      FROM base LEFT JOIN kept USING (doc_id)
      WHERE base.n_tokens - coalesce(kept.n_kept, 0) > 0
      ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(qDedupExact, qDocFingerprint, qDedupMinhash,
    qDedupGroups, qDedupSimhash, qNgramJaccard, qContainment, qTextStats,
    qTokenCount, qQualityScore, qLangId, qCorpusClean, qStringFuncs, qTfidf,
    qNgramFreq, qLmSurprisal, qDocChunks, qRepetition, qCanonicalDocs,
    qRareTokenRatio, qTemplatePrefix, qCooccurrence, qSpanDedup)
}
