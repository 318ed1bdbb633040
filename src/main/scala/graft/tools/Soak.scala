package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling soak (dev tool, like [[graft.Plans]]): materializes k×
  * key-shifted self-unions of the fact tables and re-runs the
  * scale-sensitive registered queries at each multiplier, so "would
  * this plan survive a scale-up" is a measured curve, not a claim.
  * Entity keys are shifted per copy (copy i adds i·10¹⁰), so the data
  * scales in ENTITIES — k× parts, k× orders, k× users — the axis that
  * grows in production, not just k× duplicate rows per key.
  *
  * Run: `sbt "runMain graft.tools.Soak /root/testdata/sf0.1 1,4,16"`.
  * Results land as one line per (k, query): `k query seconds`.
  * Recorded runs: SCALE.md §Measured scaling.
  */
object Soak {

  /** Queries whose plans carry the round-7 scale machinery plus two
    * plain-aggregate baselines for reference slope, and the dedup /
    * set-similarity family (banded or prefix-filtered candidate
    * generation — the plans whose 100 TB viability rests on candidate
    * volume tracking real duplication, not n²).
    */
  private val queries = Seq(
    "q1_pricing_summary",     // baseline: scan + hash agg
    "q6_forecast_revenue",    // baseline: filter + agg, near-zero slope
    "q_pagerank",             // K-level join/agg chain over cached graph
    "q_pagerank_converged",   // until-convergence twin, pinned to fixed-K
    "q_sql_pagerank",         // TVF twin: per-level degree reweighting
    "q_bfs_hops",             // checkpoint-free self-loop min-relaxation
    "q_cheapest_route",       // weighted relaxation (latency edges)
    "q_components",           // pointer-doubling label propagation
    "q_sql_components",       // TVF twin: fixed-K declarative relaxation
    "q_ppr",                  // seed-sparse restart walk (reached set)
    "q_sql_ppr",              // two-relation TVF twin of q_ppr
    "q_triangles",            // degree-oriented wedge close (co-supply)
    "q_kcore",                // until-fixpoint degree peel (co-supply)
    "q_skyline",              // group-min + distributed precmin
    "q_winsorize",            // GroupedQuantiles valueAtRanks
    "q_percentiles",          // GroupedQuantiles interpolated
    "q_mad_outliers",         // histogram medians/MAD
    "q_quantile_normalize",   // histogram rank decomposition
    "q_abc_classification",   // DistributedRank cumsum + total
    "q_histogram_equidepth",  // DistributedRank ntile
    "q_dedup_exact",          // baseline: hash groupBy over text
    "q_dedup_simhash",        // native simhash32 over the corpus
    "q_crossdoc_overlap",     // shared shingle table + df rollup
    "q_decontaminate",        // broadcast eval-gram probe
    "q_setsim_join",          // PPJoin prefix+position filters
    "q_setsim_join_counts",   // same candidates, token-count verification
    // round-8 verdict item 5 — the heavy tail of the bench registry:
    "q_span_dedup",           // positional n-gram hashes (GC-sensitive rep
                              //   spread under contention; characterize it)
    "q_grouping_sets",        // native Expand: cost scales with set count
    "q21_waiting_supplier",   // TPC-H's heaviest: EXISTS/NOT-EXISTS aggs
    // round-11 lakehouse family: each builds its manifest-table fixture
    // from the copied source, so the curve measures fixture build +
    // the operator at scale; q_mv_rewrite's EXECUTION is a mart read,
    // so its slope should be the mart's, not the source's
    "q_incremental_mart",     // manifest-diff refresh, O(touched slice)
    "q_cdc_feed",             // net change feed, O(changed files)
    "q_delete_where",         // touched-files-only rewrite
    "q_mv_rewrite")           // plan-shape rewrite onto the mart

  /** Per-copy entity-key shift. Shared with GraphQueries' soak-only
    * spread-seed variants, which undo it modulo-wise to re-spread the
    * seed suppliers across copies.
    */
  private[graft] val Shift = 10_000_000_000L

  private def scaled(df: DataFrame, k: Int, keys: Seq[String]): DataFrame =
    (0 until k).map { i =>
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * Shift)))
    }.reduce(_ unionAll _)

  /** Documents scale with a per-copy WORD suffix on top of the id
    * shift: an unperturbed copy is an exact near-dup of every other
    * copy, so pair-producing queries would emit Θ(k²) cross-copy pairs
    * — an OUTPUT property of duplicated data, not a plan property.
    * Suffixing every word (copy 3: "fox" → "foxx3") erases cross-copy
    * shingle/token overlap while preserving each copy's internal
    * near-dup structure exactly, so output volume stays k-linear and
    * the curve measures the plan.
    */
  private def scaledDocs(df: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      val shifted = df.withColumn("doc_id", col("doc_id") + lit(i * Shift))
      if (i == 0) shifted
      else shifted.withColumn("text",
        regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1x" + i))
    }.reduce(_ unionAll _)

  /** Document-LENGTH soak (`doclen` mode): same doc ids and pair
    * structure, each text concatenated with k−1 word-suffixed variants
    * of itself ("fox" → "foxL2"), so the DISTINCT trigram set per doc
    * grows ~k× (plain repetition would not grow a set) while
    * cross-doc overlap ratios — and thus the qualifying pair set —
    * stay put. This is the axis the entity soak cannot scale: it grows
    * the per-doc arrays the set-similarity verification exchanges
    * carry, which is exactly the regime split between the array and
    * token-count verification forms. Approximation: trigrams spanning
    * the SEAM between concatenated variants are new cross-variant
    * shingles whose overlap need not match the base ratio, so pairs
    * sitting exactly at the similarity threshold can flip in or out as
    * k grows — the qualifying pair set is near-invariant, not exactly
    * invariant, and the head-to-head comparison reads relative times at
    * the SAME k, which the seam noise cannot bias.
    */
  private def lengthScaledDocs(df: DataFrame, k: Int): DataFrame =
    df.withColumn("text",
      concat_ws(" ", (0 until k).map { i =>
        if (i == 0) col("text")
        else regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1L" + i)
      }: _*))

  /** Embeddings scale with a per-copy deterministic SIGN-FLIP pattern
    * on top of the vec_id shift: an unflipped copy would be an exact
    * duplicate vector — guaranteed cosine ties in every top-k and a
    * Θ(k²) near-dup explosion (the vector twin of the document word
    * suffix above). Flipping component j of copy i when
    * (31·j + 17·i) mod 97 is even decorrelates every copy pair (the
    * mod-97 wrap gives each copy a distinct pattern, not just a parity
    * class) while each flip is EXACT float negation — no precision
    * drift for the differential oracle, which reads the same file.
    */
  private def scaledEmbeddings(df: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      val shifted = df.withColumn("vec_id", col("vec_id") + lit(i * Shift))
      if (i == 0) shifted
      else shifted.withColumn("embedding", expr(
        s"""transform(embedding, (x, j) ->
           |  CASE WHEN (31 * j + 17 * $i) % 97 % 2 = 0
           |       THEN -x ELSE x END)""".stripMargin))
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ks = args(1).split(",").map(_.trim.toInt)
    // optional third arg: `doclen` scales document LENGTH instead of
    // entity count and runs only the length-sensitive pair queries;
    // `gen` writes the entity-scaled tables and runs NOTHING (the
    // data-generation step of the 10x full-registry differential sweep
    // — graft.Verify + tools/oracle_check.py then run against the dir);
    // `seedspread` runs the graph-relaxation pair with seeds re-spread
    // across the key-shifted copies (suppkey mod Shift <= 10), so the
    // k× frontier actually scales with k instead of staying stranded
    // in copy 0 (round-9 verdict item 7 — the standing curves measure
    // per-copy frontier cost, these measure the k×-frontier cost)
    val docLenMode = args.length > 2 && args(2) == "doclen"
    val genOnly = args.length > 2 && args(2) == "gen"
    val spreadMode = args.length > 2 && args(2) == "seedspread"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = graft.SparkEntry.registry.map(q => q.name -> q).toMap
    // entity-key shifts per table; unlisted tables copy through as-is
    val shiftKeys = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"))
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    ks.foreach { k =>
      // each k reads a fresh dir, so the previous multiplier's persisted
      // relations (HashedGrams is keyed per-dir; dup-groups leaves
      // localCheckpoint RDDs) are never replacement-evicted — drop them
      // so higher-k timings aren't squeezed by dead blocks
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // SPARK_GRAFT_SOAK_ROOT redirects the scaled-table output (so a
      // soak can run while the 10x differential sweep still READS the
      // default root — the sweep and the soak scale embeddings
      // differently, so sharing a dir mid-flight corrupts the sweep)
      val root = sys.env.getOrElse("SPARK_GRAFT_SOAK_ROOT", "/tmp/graft_soak")
      val dir = s"$root/x$k"
      tables.foreach { tbl =>
        // raw: the events ts column keeps its file-native representation
        // through the rewrite (micros timestamp stays timestamp, legacy
        // nanos stays int64 — see Tables.raw)
        val base = graft.engine.Tables.raw(spark, sfDir, tbl)
        val out =
          if (tbl == "documents")
            (if (docLenMode) lengthScaledDocs(base, k) else scaledDocs(base, k))
          else if (docLenMode) base
          else if (tbl == "embeddings" && genOnly) scaledEmbeddings(base, k)
          else shiftKeys.get(tbl).fold(base)(scaled(base, k, _))
        out.write.mode("overwrite").parquet(s"$dir/$tbl.parquet")
      }
      // SPARK_GRAFT_SOAK_FILTER=q_a,q_b restricts the run (family
      // iteration); unset runs the standing list
      val keep = sys.env.get("SPARK_GRAFT_SOAK_FILTER")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      // spread-seed twins of the registered relaxation pair — soak-only
      // entry points, not in the registry (their oracle story is the
      // registered pair's; only the seed predicate differs)
      val extras: Map[String, (org.apache.spark.sql.SparkSession, String) =>
          org.apache.spark.sql.DataFrame] = Map(
        "q_bfs_hops_spread" -> graft.queries.GraphQueries.bfsSpread _,
        "q_cheapest_route_spread" ->
          graft.queries.GraphQueries.cheapestRouteSpread _,
        "q_ppr_spread" -> graft.queries.GraphQueries.pprSpread _,
        // the converged production shape, pinned bit-exact to the
        // fixed-K chain at its stop round (round-10 advice: runtime
        // exercise, not spec-only)
        "q_pagerank_converged" ->
          graft.queries.GraphQueries.pagerankConvergedPinned _)
      val qs =
        (if (genOnly) Seq.empty
         else if (docLenMode) Seq("q_setsim_join", "q_setsim_join_counts")
         else if (spreadMode) extras.keys.toSeq.sorted
         else queries).filter(q => keep.forall(_.contains(q)))
      qs.foreach { name =>
        def run(): Double = {
          val t0 = System.nanoTime()
          byName.get(name).map(_.run).getOrElse(extras(name))(spark, dir)
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        run() // warm
        System.gc()
        println(f"$k%4d $name%-24s ${math.min(run(), run())}%.2f")
      }
    }
    spark.stop()
  }
}
