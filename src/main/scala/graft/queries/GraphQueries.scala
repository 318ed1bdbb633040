package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables.t
import scala.util.chaining._

/** Iterative graph algebra over the warehouse relations — the Pregel
  * message-passing pattern expressed as plain relational operators, the
  * same family as `DocQueries.dupGroupsLoop` (label propagation). The
  * reference's analytics stop at star-join marts; a training-data
  * pipeline additionally ranks entities by link structure (source
  * authority for crawl prioritization, seed weighting for mixture
  * construction), so the engine ships the canonical instance: PageRank.
  *
  * Design (100 TB stance):
  *  - One iteration = ONE equi-join (rank state ⋈ degree-weighted
  *    edges on src; the rank table is |V| vs the edge table's |E| —
  *    AQE broadcasts it while it fits, shuffles on src beyond that)
  *    + one hash aggregate on dst (map-side partial combine). Nothing
  *    ever materializes more than |V| + |E| rows; no all-pairs, no
  *    driver loop over rows.
  *  - The degree-weighted edge relation `(src, dst, outdeg)` is built
  *    once per (session, input fingerprint) and persisted via the
  *    house `SessionKeyedCache` idiom — see [[weight]] for why folding
  *    outdeg into the edges (instead of a per-round ranks⋈deg join)
  *    is the load-bearing choice.
  *  - Fixed K iterations with every intermediate referenced exactly
  *    once keeps the whole recurrence ONE declarative plan of bounded
  *    depth (no localCheckpoint needed, unlike the until-fixpoint
  *    dup-groups loop) and keeps the DuckDB oracle expressible as an
  *    unrolled CTE chain. A production run-to-tolerance would wrap the
  *    same iteration body in the dup-groups checkpoint discipline.
  *  - EXACT integer arithmetic end to end, so the oracle hash-matches
  *    bitwise: ranks live in integer micro-units (1e12 per node seed),
  *    contributions are truncating integer division (`div` in Spark,
  *    `//` in DuckDB — identical on positives), and the damping step is
  *    `base + (85 * m) div 100`. Per the overflow discipline
  *    (QueryDef.dec scaladoc): the incoming-mass sum and the ×85
  *    product are data-scaled × data-scaled style magnitudes
  *    (bounded by total mass |V|·1e12), so both travel as
  *    DECIMAL(38,0) / HUGEINT; per-node ranks re-enter BIGINT each
  *    round (rank ≤ total mass — callers beyond ~9e6 nodes must shrink
  *    the seed, and since round 10 that contract is ENFORCED: the
  *    damping step checks each node's incoming mass against the exact
  *    BIGINT re-entry bound and raises with the shrink-the-seed
  *    instruction instead of wrapping — see [[pagerankIterate]]).
  *
  * Graph: the customer–supplier fulfillment graph — an undirected edge
  * per distinct (o_custkey, l_suppkey) pair observed through
  * orders⋈lineitem. Node ids disambiguate the two key spaces
  * (customer → 2k, supplier → 2k+1). Bidirectional edges mean every
  * node in the graph has out-degree ≥ 1, so there is no dangling-mass
  * term to redistribute.
  */
object GraphQueries {

  /** 1e12 micro-units of rank mass seeded per node. */
  private val Seed = 1000000000000L

  /** (1 − d) · Seed with damping d = 0.85. */
  private val Base = 150000000000L

  private[graft] val Iters = 3

  private val graphCache =
    new graft.engine.SessionKeyedCache[(DataFrame, DataFrame)]({
      case (w, d) => w.unpersist(); d.unpersist(); ()
    })

  /** Attach each source node's out-degree to its edges: returns the
    * weighted edge relation `(src, dst, outdeg)` plus the degree table
    * `(node, outdeg)` (the latter only seeds the rank state). Folding
    * outdeg into the edge relation ONCE is what makes each PageRank
    * iteration a single join + aggregate against the |V|-sized rank
    * state — the first cut joined ranks⋈deg inside the loop, which
    * (a) added a join per round and (b) double-referenced the rank
    * state so predecessor rounds re-executed per consumer (measured:
    * 5.8 s for the un-truncated 3-round chain at sf0.1, ~1 s in this
    * shape). With every intermediate referenced exactly once the whole
    * K-round recurrence is ONE declarative plan — no checkpoint
    * needed at fixed K, and AQE broadcasts the rank state at each
    * level from runtime stats.
    */
  private[graft] def weight(edges: DataFrame): (DataFrame, DataFrame) = {
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val w = edges.join(deg, edges("src") === deg("node"))
      .select(edges("src"), edges("dst"), deg("outdeg"))
    (w, deg)
  }

  /** The weighted fulfillment graph, both relations persisted per
    * (session, input fingerprint) — every iteration and both bench
    * reps consume the same materialized ~3-long-column relation
    * instead of re-running orders⋈lineitem+distinct per reference
    * (same idiom as DocQueries.tokenized / HashedGrams).
    */
  private def fulfillmentGraph(
      s: SparkSession, dir: String): (DataFrame, DataFrame) =
    graphCache.getOrElseUpdate(s, s"pagerank_graph:$dir",
      graft.engine.SessionKeyedCache.fileFingerprint(s, s"$dir/orders.parquet")
        + "|" + graft.engine.SessionKeyedCache.fileFingerprint(
          s, s"$dir/lineitem.parquet"))({
      val pairs = t(s, dir, "orders")
        .select(col("o_orderkey"), (col("o_custkey") * 2).as("c"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), (col("l_suppkey") * 2 + 1).as("v")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("c"), col("v")).distinct()
      val und = pairs.select(col("c").as("src"), col("v").as("dst"))
        .unionAll(pairs.select(col("v").as("src"), col("c").as("dst")))
      val (w, deg) = weight(und)
      (w.persist(), deg.persist())
    })

  /** The iteration body over a weighted edge relation `(src, dst,
    * outdeg)` in which every node has out-degree ≥ 1 (callers
    * guarantee this; the fulfillment graph does by bidirectionality).
    * `deg(node, outdeg)` seeds the state. Returns `(node, pr)`.
    * Per-edge `pr div outdeg` matches the oracle's per-edge-row
    * `r.pr // d.outdeg` exactly (integer sums are order-free).
    *
    * The exact-integer contract is ENFORCED, not just documented: a
    * node's damped rank `base + (85·m) div 100` must re-enter BIGINT,
    * and since every per-node incoming mass `m` is bounded by the
    * total mass |V|·seed, overflow is impossible iff every `m` stays
    * under `(Long.Max − base)·100/85`. The damping projection checks
    * exactly that per node — the mass is already a DECIMAL(38,0) at
    * that point, so the comparison is exact, costs one codegen'd
    * branch over |V| rows per round (noise next to the |E| join), and
    * needs no extra job or count. On violation the round fails loudly
    * with the shrink-the-seed instruction instead of wrapping
    * (GraphQueriesSpec trips it with an oversized seed on 4 nodes).
    */
  /** One PageRank round: rank state `(node, pr)` → next state, with the
    * overflow guard in the damping projection. Shared by the fixed-K
    * chain ([[pagerankIterate]]) and the until-convergence loop
    * ([[pagerankConverged]]).
    */
  private def pagerankRound(edgesW: DataFrame, ranks: DataFrame,
      seed: Long, base: Long, hintStateJoin: Boolean = false): DataFrame = {
    val mMax = (BigInt(Long.MaxValue) - base) * 100 / 85
    val mMaxLit = lit(new java.math.BigDecimal(mMax.bigInteger))
    // hintStateJoin (round 19, TVF paths only): with the weighted
    // relation explicitly hash-partitioned on src, a shuffled-hash
    // join of the state rides that partitioning — one exchange per
    // level, no per-level broadcast-build stage round-trip (the
    // relaxRounds trade). Skew-safe: the build side is the rank state,
    // one row per node. The DataFrame twins keep AQE's broadcast —
    // their cached relation is not key-partitioned, and a forced SHJ
    // would plant a per-level exchange of the edges instead.
    val r = if (hintStateJoin) ranks.hint("shuffle_hash") else ranks
    edgesW.join(r, edgesW("src") === r("node"))
      .groupBy(edgesW("dst").as("node"))
      .agg(sum(call_function("div", col("pr"), col("outdeg"))
        .cast("decimal(38,0)")).as("m"))
      .select(col("node"),
        when(col("m") > mMaxLit, raise_error(concat(
          lit("pagerank: incoming rank mass "), col("m").cast("string"),
          lit(s" exceeds the BIGINT re-entry bound $mMax — shrink the " +
            s"per-node seed (currently $seed) so that " +
            "|V| * seed <= 9223372036854775807"))))
        .otherwise(lit(base) + call_function("div",
          lit(85).cast("decimal(38,0)") * col("m"), lit(100))).as("pr"))
  }

  private[graft] def pagerankIterate(edgesW: DataFrame, deg: DataFrame,
      iters: Int, seed: Long = Seed, base: Long = Base,
      hintStateJoin: Boolean = false): DataFrame = {
    var ranks = deg.select(col("node"), lit(seed).as("pr"))
    for (_ <- 1 to iters)
      ranks = pagerankRound(edgesW, ranks, seed, base, hintStateJoin)
    ranks
  }

  /** The PRODUCTION shape: the same exact-integer recurrence run until
    * no node's rank moves by more than `tolerance` micro-units (the
    * fixed-K chain stays the oracle-checkable core — an unrolled-CTE
    * oracle needs a known K). Exercised at runtime by the soak
    * harness's `q_pagerank_converged` entry
    * ([[pagerankConvergedPinned]]), which pins the converged state
    * bit-exact to the fixed-K chain at the stop round on every soak
    * run, and by the spec's stop-exactness proof. Checkpoint cadence follows the dup-groups
    * discipline (`engine.LabelPropagation`): the convergence test
    * references each round's state TWICE (next round's input + the
    * delta join), so every round ends in an eager checkpoint through
    * the [[graft.engine.Checkpoints]] seam (`graft.iter.checkpoint` =
    * local|reliable) — without it the logical plan doubles per round. That is the
    * measured trade between the two iterative regimes: fixed K + single
    * reference per level = one declarative checkpoint-free plan
    * (pagerankIterate); data-dependent stop = per-round checkpoint
    * barriers, O(1) plan size, convergence observable per round
    * (SCALE.md §Round-10).
    *
    * Returns (final ranks `(node, pr)`, rounds run). Fails loudly at
    * `maxRounds` rather than returning a silent partial fixpoint.
    */
  private[graft] def pagerankConverged(edgesW: DataFrame, deg: DataFrame,
      tolerance: Long, maxRounds: Int = 64,
      seed: Long = Seed, base: Long = Base): (DataFrame, Int) = {
    var ranks = deg.select(col("node"), lit(seed).as("pr"))
      .pipe(graft.engine.Checkpoints.iter)
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      val next = pagerankRound(edgesW, ranks, seed, base)
        .pipe(graft.engine.Checkpoints.iter)
      // max per-node move; the inner join is total on graphs where
      // every node keeps incoming mass (bidirectional edges — the
      // operator's stated contract, same as the TVF's)
      val row = next.as("n")
        .join(ranks.as("p"), col("n.node") === col("p.node"))
        .agg(max(abs(col("n.pr") - col("p.pr")))).head()
      val moved = if (row.isNullAt(0)) 0L else row.getLong(0)
      ranks = next
      rounds += 1
      done = moved <= tolerance
      System.err.println(s"[pagerank] round $rounds: max_move=$moved")
    }
    if (!done) throw new IllegalStateException(
      s"pagerank did not converge to tolerance=$tolerance in $maxRounds " +
        "rounds")
    (ranks, rounds)
  }

  private[queries] def pagerank(s: SparkSession, dir: String): DataFrame = {
    val (w, deg) = fulfillmentGraph(s, dir)
    pagerankIterate(w, deg, Iters)
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        call_function("div", col("node"), lit(2)).as("node_key"),
        col("pr"))
      .orderBy(col("node_type"), col("node_key"))
  }

  /** Rounds of BFS min-relaxation — K=3 keeps the unrolled oracle
    * readable and the per-round checkpoint chain short.
    */
  private val BfsRounds = 3

  /** Append a zero-weight self-loop per node of `nodes` to a weighted
    * edge relation `(src, dst, w)`. The loop weight takes the weight
    * column's own type, so callers keep their distance type (INT hops
    * for BFS, BIGINT days for routes). Production callers pass the
    * CACHED degree table's node column, so the loop branch costs a
    * |V|-row scan per plan level, not a re-derived distinct over |E|
    * (measured: deriving nodes from the edges inside the loop made the
    * declarative form slower than the checkpointed one it replaces).
    */
  private[graft] def withLoops(wedges: DataFrame,
      nodes: DataFrame): DataFrame = {
    val zero = lit(0).cast(wedges.schema("w").dataType)
    wedges.select(col("src"), col("dst"), col("w"))
      .unionByName(nodes.select(col("node").as("src"),
        col("node").as("dst"), zero.as("w")))
  }

  /** K rounds of Bellman-Ford min-relaxation over a weighted edge
    * relation `(src, dst, w)` from a seed state `(node, d)`: after the
    * call, `d` is the cheapest path cost from any seed using at most
    * `rounds` edges; unreached nodes are absent.
    *
    * Zero-weight SELF-LOOPS stand in for the textbook "union the
    * standing distances" branch: a node's current distance survives a
    * round as relaxation over its own loop, so one round is ONE
    * equi-join + ONE min-aggregate and the distance state is
    * referenced exactly once — the whole K-round recurrence stays a
    * single declarative plan with no checkpoints, the same shape as
    * [[pagerankIterate]] (the first cut unioned the state per round,
    * which double-references it and needs an eager localCheckpoint per
    * round to stop 2^K re-execution). Loops cover every node that can
    * hold a distance — sources, destinations, and the seeds — and take
    * the weight column's own type so callers keep their distance type
    * (INT hops for BFS, BIGINT days for routes). The loop relation's
    * distinct repeats per plan level, but its exchange is identical
    * across levels, so ReuseExchange materializes it once.
    */
  /** Minimum K at which [[relaxRounds]] (and the rank TVF expansions)
    * eagerly materialize their loop relation as a localCheckpoint leaf
    * instead of sharing one reusable exchange — see the comment inside
    * [[relaxRounds]] for the measured crossover.
    */
  private[graft] val MaterializeRelationRounds = 4

  private[graft] def relaxRounds(relation: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    // Materialize the loop relation ONCE as an eager localCheckpoint
    // leaf (round-19 optimization, on round 18's shared-exchange form).
    // Round 18 hash-partitioned the relation once and leaned on
    // exchange reuse, but the executed plans showed the wall was the
    // sequential AQE stage-materialization round-trips: every one of
    // the K levels re-planned through the relation's whole subtree —
    // cache scans wrapped in per-level TableCacheQueryStage nodes (26
    // of them in q_sql_components' final plan), plus the union/filter
    // replayed per level — ~60 distinct AQE query stages for K=8,
    // executed strictly in sequence because each level feeds the next.
    // Checkpointing collapses the relation to a leaf RDD scan: the
    // subtree executes exactly once (inside the timed region — every
    // rep re-materializes it), per-level plans shrink to
    // join+aggregate over two leaves, and the per-level replan/
    // materialization round-trips drop with them (measured: 36 → 11
    // jobs, 7.1 → 1.8 s exec wall on q_sql_components at sf0.1).
    //
    // The keyed repartition BEFORE the checkpoint pins
    // hashpartitioning(src) into the LogicalRDD's outputPartitioning
    // (Dataset.checkpoint preserves the executed plan's partitioning),
    // so at sizes where the per-level join is not a broadcast the
    // relation side still needs no exchange — the 100 TB stance is
    // unchanged from round 18: one |E|-shuffle total, K state-sized
    // exchanges. localCheckpoint blocks are MEMORY_AND_DISK on the
    // executors — the same bytes the reused exchange held in shuffle
    // files before.
    //
    // The explicit null filter predates the checkpoint (round 18) and
    // is still load-bearing for semantics: callers guarantee non-null
    // ids, and a hypothetical null endpoint could never survive the
    // next level's join anyway (GraphQueriesSpec pins this).
    // The crossover is measured, not guessed: at K=3 (BFS, routes, the
    // 3-iteration rank TVFs) the eager materialization's fixed cost
    // (~0.4-0.7 s at sf0.1: its own stage round-trips + storing the
    // rows) exceeds the ~3 levels of replan savings — bfs/route ran
    // 15-25% SLOWER checkpointed — while at K=8 (components TVF) the
    // saving is ~2.2 s. Below the threshold, keep round 18's form: one
    // shared coalescible keyed repartition whose identical exchange
    // every level reuses.
    val base = relation
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("src"))
    val rel = if (rounds >= MaterializeRelationRounds) base.localCheckpoint()
      else base
    var dist = seeds
    for (_ <- 1 to rounds) {
      // dataset aliases: from round 2 on, the state's lineage contains
      // the relation itself, so bare Dataset-column references would
      // trip DetectAmbiguousSelfJoin — qualified names resolve cleanly
      val prev = dist.select(col("node").as("pnode"), col("d").as("pd"))
      dist = rel.as("e").join(prev.as("p").hint("shuffle_hash"),
          col("e.src") === col("p.pnode"))
        .groupBy(col("e.dst").as("node"))
        .agg(min(col("p.pd") + col("e.w")).as("d"))
    }
    dist
  }

  /** Bounded-radius BFS — [[relaxRounds]] at unit weight over any edge
    * relation (nodes for the loop branch derived from the edges +
    * seeds; production paths pass the cached degree table instead).
    */
  private[graft] def bfsHops(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .unionByName(seeds.select(col("node")))
      .distinct()
    relaxRounds(withLoops(edges.withColumn("w", lit(1)), nodes),
      seeds, rounds)
  }

  /** Seed set: supplier nodes with suppkey ≤ 10 that appear in the
    * graph — a fixed, deterministic handful of sources.
    */
  private def supplierSeeds(deg: DataFrame): DataFrame =
    deg.filter(col("node") % 2 === 1 &&
        call_function("div", col("node"), lit(2)) <= 10)
      .select(col("node"), lit(0).as("d"))

  private[queries] def bfs(s: SparkSession, dir: String): DataFrame = {
    val (w, deg) = fulfillmentGraph(s, dir)
    relaxRounds(
      withLoops(w.select(col("src"), col("dst")).withColumn("w", lit(1)),
        deg.select(col("node"))),
      supplierSeeds(deg), BfsRounds)
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        call_function("div", col("node"), lit(2)).as("node_key"),
        col("d").as("hops"))
      .orderBy(col("node_type"), col("node_key"))
  }

  /** One unrolled BFS oracle round. */
  private def bfsOracleRound(n: Int): String = s"""
      d$n AS (SELECT node, MIN(d) AS d FROM (
                SELECT e.dst AS node, r.d + 1 AS d
                FROM edges e JOIN d${n - 1} r ON r.node = e.src
                UNION ALL SELECT node, d FROM d${n - 1}) u
              GROUP BY node)"""

  val qBfsHops = QueryDef(
    "q_bfs_hops",
    (s, dir) => bfs(s, dir),
    Some(s"""
      WITH pairs AS (
        SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS v
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      edges AS (SELECT c AS src, v AS dst FROM pairs
                UNION ALL SELECT v, c FROM pairs),
      nodes AS (SELECT DISTINCT src AS node FROM edges),
      d0 AS (SELECT node, 0 AS d FROM nodes
             WHERE node % 2 = 1 AND node // 2 <= 10),${
        (1 to BfsRounds).map(bfsOracleRound).mkString(",")}
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
             node // 2 AS node_key, d AS hops
      FROM d$BfsRounds
      ORDER BY node_type, node_key"""))

  private val routeCache =
    new graft.engine.SessionKeyedCache[DataFrame](_.unpersist())

  /** Latency-weighted fulfillment edges `(src, dst, w)`: w = the
    * minimum observed order→ship lag in whole days over the pair's
    * line items (exact integer via date arithmetic — no float), both
    * directions, session-persisted like the unweighted graph. The
    * weight aggregate shuffles one row per distinct (cust, supp) pair.
    */
  private def latencyEdges(s: SparkSession, dir: String): DataFrame =
    routeCache.getOrElseUpdate(s, s"route_wedges:$dir",
      graft.engine.SessionKeyedCache.fileFingerprint(s, s"$dir/orders.parquet")
        + "|" + graft.engine.SessionKeyedCache.fileFingerprint(
          s, s"$dir/lineitem.parquet"))({
      val wpairs = t(s, dir, "orders")
        .select(col("o_orderkey"), (col("o_custkey") * 2).as("c"),
          col("o_orderdate"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), (col("l_suppkey") * 2 + 1).as("v"),
            col("l_shipdate")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c"), col("v"))
        .agg(min(datediff(col("l_shipdate"), col("o_orderdate"))
          .cast("bigint")).as("w"))
      wpairs.select(col("c").as("src"), col("v").as("dst"), col("w"))
        .unionAll(wpairs.select(col("v").as("src"), col("c").as("dst"),
          col("w")))
        .persist()
    })

  /** Cheapest supply route: minimum cumulative order→ship latency from
    * the seed suppliers within [[BfsRounds]] edges — [[relaxRounds]]
    * over the latency-weighted graph (weights are non-negative, so
    * bounded-hop Bellman-Ford is the exact ≤K-edge optimum).
    */
  private[queries] def cheapestRoute(s: SparkSession, dir: String): DataFrame = {
    val wedges = latencyEdges(s, dir)
    // the latency pairs and the fulfillment graph share one node
    // universe (both enumerate the distinct (cust, supp) pairs of
    // orders⋈lineitem), so the cached degree table supplies both the
    // seed filter and the self-loop node set here too
    val deg = fulfillmentGraph(s, dir)._2
    val seeds = deg.filter(col("node") % 2 === 1 &&
        call_function("div", col("node"), lit(2)) <= 10)
      .select(col("node"), lit(0L).as("d"))
    relaxRounds(withLoops(wedges, deg.select(col("node"))), seeds, BfsRounds)
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        call_function("div", col("node"), lit(2)).as("node_key"),
        col("d").as("route_days"))
      .orderBy(col("node_type"), col("node_key"))
  }

  /** One unrolled weighted-relaxation oracle round. */
  private def routeOracleRound(n: Int): String = s"""
      d$n AS (SELECT node, MIN(d) AS d FROM (
                SELECT e.dst AS node, r.d + e.w AS d
                FROM wedges e JOIN d${n - 1} r ON r.node = e.src
                UNION ALL SELECT node, d FROM d${n - 1}) u
              GROUP BY node)"""

  val qCheapestRoute = QueryDef(
    "q_cheapest_route",
    (s, dir) => cheapestRoute(s, dir),
    Some(s"""
      WITH wpairs AS (
        SELECT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS v,
               MIN(CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)) AS BIGINT))
                 AS w
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2),
      wedges AS (SELECT c AS src, v AS dst, w FROM wpairs
                 UNION ALL SELECT v, c, w FROM wpairs),
      d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS d
             FROM wedges WHERE src % 2 = 1 AND src // 2 <= 10),${
        (1 to BfsRounds).map(routeOracleRound).mkString(",")}
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
             node // 2 AS node_key, d AS route_days
      FROM d$BfsRounds
      ORDER BY node_type, node_key"""))

  /** One unrolled oracle iteration: `i{n}` sums incoming shares,
    * `r{n}` applies damping. SUM over BIGINT is HUGEINT in DuckDB
    * (mirror of the Spark side's DECIMAL(38,0) accumulator).
    */
  private def oracleIter(n: Int): String = s"""
      i$n AS (SELECT e.dst AS node, SUM(r.pr // d.outdeg) AS m
              FROM edges e
              JOIN r${n - 1} r ON r.node = e.src
              JOIN deg d ON d.node = e.src
              GROUP BY e.dst),
      r$n AS (SELECT node,
                     CAST($Base + (85::HUGEINT * m) // 100 AS BIGINT) AS pr
              FROM i$n)"""

  /** Shared unrolled-CTE oracle for PageRank over the fulfillment
    * graph — also the oracle of the SQL-TVF twin (q_sql_pagerank in
    * SqlSurfaceQueries), which must agree with the DataFrame form
    * exactly.
    */
  private[graft] lazy val pagerankOracle: String = s"""
      WITH pairs AS (
        SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS v
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      edges AS (SELECT c AS src, v AS dst FROM pairs
                UNION ALL SELECT v, c FROM pairs),
      deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
      r0 AS (SELECT node, CAST($Seed AS BIGINT) AS pr FROM deg),${
        (1 to Iters).map(oracleIter).mkString(",")}
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
             node // 2 AS node_key, pr
      FROM r$Iters
      ORDER BY node_type, node_key"""

  /** The cached undirected fulfillment edge list `(src, dst)` — the
    * input the SQL-TVF twin registers as a temp view.
    */
  private[graft] def undirectedEdges(s: SparkSession, dir: String): DataFrame =
    fulfillmentGraph(s, dir)._1.select(col("src"), col("dst"))

  val qPagerank = QueryDef(
    "q_pagerank",
    (s, dir) => pagerank(s, dir),
    Some(pagerankOracle))

  // ---------------------------------------------------------------- //
  // Weakly connected components (round-10 verdict item 4): the        //
  // standard precursor to seeding and mixture construction — the     //
  // engine owned the machinery (the dedup family's label             //
  // propagation) but only exposed it through near-dup groups.        //
  // ---------------------------------------------------------------- //

  /** Rounds for the bounded-diameter component forms (the unrolled
    * oracle and the `connected_components` TVF): after K rounds of
    * min-label relaxation each node holds the minimum node id within K
    * hops, which IS its component minimum whenever every node is
    * within K hops of its component's min-id node. 8 comfortably
    * covers the fulfillment graph (measured radius ≤ 3 from the min
    * node at every verified scale — the q_components/q_sql_components
    * oracle agreement re-proves it per run) while keeping the oracle
    * at 8·|E| join rows and the TVF at 8 plan levels.
    */
  private[graft] val ComponentsRounds = 8

  /** Bounded-diameter connected components as ONE declarative plan:
    * [[relaxRounds]] at zero weight with each node's own id as its
    * seed "distance" — a round's min-relaxation IS min-label
    * propagation, with the self-loops retaining a node's standing
    * label exactly as they retain a BFS distance. The checkpoint-free
    * twin of `engine.LabelPropagation` (which pointer-doubles to the
    * true fixpoint, any diameter): fixed K keeps the whole recurrence
    * a single plan — the TVF-expressible, oracle-checkable form.
    */
  private[graft] def componentsK(edges: DataFrame, nodes: DataFrame,
      rounds: Int): DataFrame = {
    val idType = edges.schema("src").dataType
    relaxRounds(
      withLoops(edges.select(col("src"), col("dst"))
        .withColumn("w", lit(0).cast(idType)), nodes),
      nodes.select(col("node"), col("node").as("d")), rounds)
      .select(col("node"), col("d").as("component"))
  }

  /** Weakly connected components of the fulfillment graph, to the true
    * fixpoint: `engine.LabelPropagation` (pointer-doubling min-label
    * propagation, O(log diameter) rounds under per-round checkpoints)
    * over the session-cached bidirectional edges. component = the
    * component's minimum encoded node id. The oracle is the unrolled
    * K-round propagation CTE ([[componentsOracle]]) — exact whenever
    * every node is within K hops of its component min, so the oracle
    * match doubles as a measured radius ≤ [[ComponentsRounds]] check.
    */
  private[queries] def components(s: SparkSession, dir: String): DataFrame = {
    val (w, _) = fulfillmentGraph(s, dir)
    graft.engine.LabelPropagation
      .components(w.select(col("src"), col("dst")), "components")
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        call_function("div", col("node"), lit(2)).as("node_key"),
        col("label").as("component"))
      .orderBy(col("node_type"), col("node_key"))
  }

  /** One unrolled min-label propagation oracle round. Unlike the K=3
    * BFS oracle (whose per-round self-UNION references the previous
    * level twice — tolerable at 2³ if the engine inlines the CTE), the
    * K=8 chain MUST reference each level exactly once: DuckDB inlines
    * non-recursive CTEs, so a double reference doubles the inlined
    * plan per level — 2⁸ copies of the edge join thrashed a 48 GB
    * memory budget at the 10× sweep before this shape. The fix is the
    * Spark side's own trick verbatim: self-loops in `alledges` carry a
    * node's standing label through the round, so one join + one
    * aggregate per level, singly referenced, linear in K·|E|.
    */
  private def componentsOracleRound(n: Int): String = s"""
      l$n AS (SELECT e.dst AS node, MIN(l.label) AS label
              FROM alledges e JOIN l${n - 1} l ON l.node = e.src
              GROUP BY e.dst)"""

  /** Shared by q_components (convergence form) and q_sql_components
    * (the `connected_components` TVF) — both must agree with it
    * exactly, and with each other.
    */
  private[graft] lazy val componentsOracle: String = s"""
      WITH pairs AS (
        SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS v
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      edges AS (SELECT c AS src, v AS dst FROM pairs
                UNION ALL SELECT v, c FROM pairs),
      nodes AS (SELECT DISTINCT src AS node FROM edges),
      alledges AS (SELECT src, dst FROM edges
                   UNION ALL SELECT node, node FROM nodes),
      l0 AS (SELECT node, node AS label FROM nodes),${
        (1 to ComponentsRounds).map(componentsOracleRound).mkString(",")}
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
             node // 2 AS node_key, label AS component
      FROM l$ComponentsRounds
      ORDER BY node_type, node_key"""

  val qComponents = QueryDef(
    "q_components",
    (s, dir) => components(s, dir),
    Some(componentsOracle))

  // ---------------------------------------------------------------- //
  // Soak-only seed variants (round-9 verdict item 7): the entity-key  //
  // shift strands the standing suppkey ≤ 10 seeds in copy 0, so the  //
  // k× soak never relaxes a k×-sized frontier — the flat curves are  //
  // partly a seed-isolation artifact. These read the suppkey MODULO  //
  // the copy shift, i.e. seed suppliers 1..10 of EVERY key-shifted   //
  // copy, so the frontier scales with k. Reached through             //
  // tools.Soak's `seedspread` extras, not the registry (the oracle   //
  // semantics of the registered pair are unchanged).                 //
  // ---------------------------------------------------------------- //

  private def spreadSeeds(deg: DataFrame, d: org.apache.spark.sql.Column)
      : DataFrame =
    deg.filter(col("node") % 2 === 1 &&
        call_function("div", col("node"), lit(2)) % lit(graft.tools.Soak.Shift)
          <= 10)
      .select(col("node"), d.as("d"))

  private[graft] def bfsSpread(s: SparkSession, dir: String): DataFrame = {
    val (w, deg) = fulfillmentGraph(s, dir)
    relaxRounds(
      withLoops(w.select(col("src"), col("dst")).withColumn("w", lit(1)),
        deg.select(col("node"))),
      spreadSeeds(deg, lit(0)), BfsRounds)
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        call_function("div", col("node"), lit(2)).as("node_key"),
        col("d").as("hops"))
      .orderBy(col("node_type"), col("node_key"))
  }

  private[graft] def cheapestRouteSpread(s: SparkSession,
      dir: String): DataFrame = {
    val wedges = latencyEdges(s, dir)
    val deg = fulfillmentGraph(s, dir)._2
    relaxRounds(withLoops(wedges, deg.select(col("node"))),
      spreadSeeds(deg, lit(0L)), BfsRounds)
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        call_function("div", col("node"), lit(2)).as("node_key"),
        col("d").as("route_days"))
      .orderBy(col("node_type"), col("node_key"))
  }

  // ---------------------------------------------------------------- //
  // Personalized PageRank (round 10): the seed-restart random walk —  //
  // the standard quality-propagation primitive for corpus curation    //
  // (expand a trusted seed set through the link structure, keep what  //
  // accumulates rank). Same exact-integer recurrence as [[pagerank]], //
  // but mass enters ONLY at the seeds, so the rank state is the       //
  // REACHED set, not |V| — the property that makes PPR usable on a    //
  // 100 TB graph where |V|-dense state per query would not be.        //
  // ---------------------------------------------------------------- //

  /** One personalized-PageRank round over the weighted edges:
    *   pr'(v) = [v ∈ S]·base + (85 · Σ_{u→v} pr(u) div outdeg(u)) div 100
    * expressed as contribution rows UNION ALL constant seed-base rows,
    * then ONE hash aggregate with two sums — the restart term rides the
    * same shuffle as the incoming mass, so the rank state is referenced
    * exactly once per round and the K-round chain stays a single
    * declarative checkpoint-free plan (the [[pagerankIterate]] /
    * [[relaxRounds]] discipline; a per-round outer join against the
    * seed table would be a second join and, for a full outer, a
    * non-broadcastable one). Nodes keep a row iff they are a seed or
    * received mass — absent = rank 0, the sparse-frontier contract.
    *
    * Overflow: total circulating mass is bounded by |S|·seed +
    * rounds·|S|·base ≪ |V|·seed (the plain-PageRank bound), the mass
    * sum travels as DECIMAL(38,0), and the BIGINT base sum is
    * ANSI-checked — a wrap is loud, never silent.
    */
  private def pprRound(edgesW: DataFrame, ranks: DataFrame,
      seedBase: DataFrame, hintStateJoin: Boolean = false): DataFrame = {
    // see pagerankRound for the hintStateJoin rationale
    val r = if (hintStateJoin) ranks.hint("shuffle_hash") else ranks
    edgesW.join(r, edgesW("src") === r("node"))
      .select(edgesW("dst").as("node"),
        call_function("div", col("pr"), col("outdeg"))
          .cast("decimal(38,0)").as("m"),
        lit(0L).as("b"))
      .unionByName(seedBase)
      .groupBy(col("node"))
      .agg(sum(col("m")).as("sm"), sum(col("b")).as("sb"))
      .select(col("node"),
        (col("sb") + call_function("div",
          lit(85).cast("decimal(38,0)") * col("sm"), lit(100))).as("pr"))
  }

  private[graft] def pprIterate(edgesW: DataFrame, seeds: DataFrame,
      iters: Int, seed: Long = Seed, base: Long = Base,
      hintStateJoin: Boolean = false): DataFrame = {
    val seedBase = seeds.select(col("node"),
      lit(BigDecimal(0)).cast("decimal(38,0)").as("m"), lit(base).as("b"))
    var ranks = seeds.select(col("node"), lit(seed).as("pr"))
    for (_ <- 1 to iters)
      ranks = pprRound(edgesW, ranks, seedBase, hintStateJoin)
    ranks
  }

  private[queries] def ppr(s: SparkSession, dir: String): DataFrame = {
    val (w, deg) = fulfillmentGraph(s, dir)
    pprIterate(w, supplierSeeds(deg).select(col("node")), Iters)
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        call_function("div", col("node"), lit(2)).as("node_key"),
        col("pr"))
      .orderBy(col("node_type"), col("node_key"))
  }

  /** One unrolled PPR oracle round — the union-then-aggregate shape
    * verbatim. SUM over BIGINT is HUGEINT in DuckDB (mirror of the
    * DECIMAL(38,0) / ANSI-BIGINT Spark accumulators), re-entering
    * BIGINT after the damped projection like [[oracleIter]].
    */
  private def pprOracleIter(n: Int): String = s"""
      p$n AS (SELECT node,
                     CAST(SUM(b) + (85::HUGEINT * SUM(m)) // 100 AS BIGINT)
                       AS pr
              FROM (SELECT e.dst AS node, r.pr // d.outdeg AS m,
                           CAST(0 AS BIGINT) AS b
                    FROM edges e
                    JOIN p${n - 1} r ON r.node = e.src
                    JOIN deg d ON d.node = e.src
                    UNION ALL
                    SELECT node, CAST(0 AS BIGINT) AS m,
                           CAST($Base AS BIGINT) AS b
                    FROM seeds) u
              GROUP BY node)"""

  /** The seed node set as a relation — the input the `ppr` TVF twin
    * registers as a temp view beside the edge view.
    */
  private[graft] def seedNodes(s: SparkSession, dir: String): DataFrame =
    supplierSeeds(fulfillmentGraph(s, dir)._2).select(col("node"))

  /** Shared unrolled-CTE oracle for personalized PageRank — also the
    * oracle of the SQL-TVF twin (q_sql_ppr in SqlSurfaceQueries),
    * which must agree with the DataFrame form exactly.
    */
  private[graft] lazy val pprOracle: String = s"""
      WITH pairs AS (
        SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS v
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      edges AS (SELECT c AS src, v AS dst FROM pairs
                UNION ALL SELECT v, c FROM pairs),
      deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
      seeds AS (SELECT node FROM deg WHERE node % 2 = 1 AND node // 2 <= 10),
      p0 AS (SELECT node, CAST($Seed AS BIGINT) AS pr FROM seeds),${
        (1 to Iters).map(pprOracleIter).mkString(",")}
      SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
             node // 2 AS node_key, pr
      FROM p$Iters
      ORDER BY node_type, node_key"""

  val qPpr = QueryDef(
    "q_ppr",
    (s, dir) => ppr(s, dir),
    Some(pprOracle))

  // ---------------------------------------------------------------- //
  // Triangle counting (round 10): the fulfillment graph is bipartite  //
  // (triangle-free by construction), so the subject is the CO-SUPPLY  //
  // graph — suppliers that co-occur on ≥ MinCooccur distinct orders.  //
  // Per-order supplier sets are tiny (≤ 7 line items), so the pair    //
  // fan-out is bounded at C(7,2) per order; the co-occurrence         //
  // threshold then keeps only statistically meaningful edges (the     //
  // q_cooccurrence discipline), exactly the sparsification a 100 TB   //
  // projection of a bipartite graph needs — an UNthresholded          //
  // projection is quadratic in the hub degree and is the classic      //
  // scale-killer here.                                                //
  // ---------------------------------------------------------------- //

  /** Minimum distinct co-orders for a co-supply edge. */
  private[graft] val MinCooccur = 5

  private val triCache =
    new graft.engine.SessionKeyedCache[DataFrame](_.unpersist())

  /** The DEGREE-ORIENTED co-supply edge relation `(src, dst, ddeg)`:
    * each undirected edge directed from its (degree, id)-smaller to its
    * (degree, id)-larger endpoint, carrying the head's degree. The
    * orientation is the load-bearing choice for counting: every
    * triangle has exactly ONE vertex from which both others are
    * outgoing (its minimum in the total (deg, id) order), so
    * enumerating wedges from out-edges only bounds the per-vertex work
    * by out-degree², and out-degrees under degree orientation are
    * O(√|E|) (arboricity bound) instead of the raw max degree — the
    * hub that breaks naive wedge counting at scale has tiny OUT-degree
    * here. Session-persisted like the other derived graphs.
    */
  private[graft] def orientByDegree(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("s1").as("node"))
      .unionByName(edges.select(col("s2").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val fwd = struct(col("d1"), col("s1")) < struct(col("d2"), col("s2"))
    edges
      .join(deg.select(col("node").as("n1"), col("d").as("d1")),
        col("s1") === col("n1"))
      .join(deg.select(col("node").as("n2"), col("d").as("d2")),
        col("s2") === col("n2"))
      .select(
        when(fwd, col("s1")).otherwise(col("s2")).as("src"),
        when(fwd, col("s2")).otherwise(col("s1")).as("dst"),
        when(fwd, col("d2")).otherwise(col("d1")).as("ddeg"))
  }

  private def cosupplyOriented(s: SparkSession, dir: String): DataFrame =
    triCache.getOrElseUpdate(s, s"cosupply_oriented:$dir",
      graft.engine.SessionKeyedCache.fileFingerprint(
        s, s"$dir/lineitem.parquet"))({
      val lo = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      val edges = lo.as("a").join(lo.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_suppkey") < col("b.l_suppkey"))
        .groupBy(col("a.l_suppkey").as("s1"), col("b.l_suppkey").as("s2"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= MinCooccur)
        .select(col("s1"), col("s2"))
      orientByDegree(edges).persist()
    })

  /** Per-supplier triangle count in the thresholded co-supply graph:
    * wedges from each vertex's out-edges (head pair ordered by the
    * SAME (deg, id) key as the orientation, so the closing edge has
    * exactly one possible direction), closed by one equi-join back to
    * the oriented edges, then each triangle credited to its three
    * vertices. Two self-equi-joins of the cached oriented relation +
    * one explode + one aggregate — no cartesian, no unbounded
    * fan-out.
    */
  private[graft] def triangleCounts(oriented: DataFrame): DataFrame = {
    val tris = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e2.src") === col("e1.src") &&
          (struct(col("e1.ddeg"), col("e1.dst")) <
            struct(col("e2.ddeg"), col("e2.dst"))))
      .join(oriented.as("e3"),
        col("e3.src") === col("e1.dst") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"),
        col("e2.dst").as("c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("s_suppkey"))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("triangles"))
  }

  private[queries] def triangles(s: SparkSession, dir: String): DataFrame =
    triangleCounts(cosupplyOriented(s, dir))
      .orderBy(col("s_suppkey"))

  /** The oracle counts the SAME triangles through a genuinely different
    * formulation — id-canonical undirected edges (s1 < s2) and the
    * textbook three-way join with both wedge heads id-ordered — so the
    * degree-orientation logic is cross-checked against an independent
    * derivation, not mirrored. (The id-ordered form is the one that
    * does NOT scale — its wedge fan-out is the raw degree² — which is
    * fine for an oracle and exactly why the engine side orients by
    * degree.)
    */
  val qTriangles = QueryDef(
    "q_triangles",
    (s, dir) => triangles(s, dir),
    Some(s"""
      WITH lo AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      edges AS (SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
                FROM lo a JOIN lo b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_suppkey < b.l_suppkey
                GROUP BY 1, 2 HAVING COUNT(*) >= $MinCooccur),
      tris AS (SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
               FROM edges e1
               JOIN edges e2 ON e2.s1 = e1.s1 AND e2.s2 > e1.s2
               JOIN edges e3 ON e3.s1 = e1.s2 AND e3.s2 = e2.s2)
      SELECT s_suppkey, COUNT(*) AS triangles
      FROM (SELECT a AS s_suppkey FROM tris
            UNION ALL SELECT b FROM tris
            UNION ALL SELECT c FROM tris) u
      GROUP BY s_suppkey
      ORDER BY s_suppkey"""))

  // ---------------------------------------------------------------- //
  // k-core decomposition — the standard graph-quality peel (round-10  //
  // verdict item 5): spam/bot subgraphs die under iterated            //
  // low-degree removal, so the k-core is the curation counterpart of  //
  // q_components before seeding from link structure.                  //
  // ---------------------------------------------------------------- //

  /** Core order for the registered query. */
  private[graft] val KCoreK = 3

  /** Peel steps unrolled in the oracle CTE. The peel is MONOTONE
    * (the node set only shrinks) and IDEMPOTENT at its fixpoint, so an
    * over-unrolled oracle is harmless — the Spark side asserts its
    * data-dependent stop landed within this bound, which keeps the
    * fixed unrolling sufficient by construction.
    */
  private[graft] val KCorePeelUnroll = 12

  /** Until-fixpoint k-core peel over a SYMMETRIC edge relation
    * `(src, dst)`: each round keeps the nodes whose degree within the
    * current induced subgraph is ≥ k (two semi-joins + one aggregate —
    * O(|E|) shuffled rows per round), checkpointed through the
    * [[graft.engine.Checkpoints]] seam because the shrinking node set
    * is referenced three times per round. Data-dependent stop, loud at
    * the cap ([[graft.engine.LabelPropagation]]'s regime). Rounds are
    * bounded by the peel depth (≤ max coreness steps), which the
    * thresholded co-supply graph keeps single-digit — and the
    * [[KCorePeelUnroll]] assertion makes that bound checked, not
    * assumed. Returns `(node, core_deg)` — the surviving nodes with
    * their degree inside the k-core.
    */
  private[graft] def kcorePeel(edges: DataFrame, k: Int,
      tag: String = "kcore", maxUnroll: Int = Int.MaxValue): DataFrame = {
    def induced(nodes: DataFrame): DataFrame = edges
      .join(nodes.select(col("node").as("src")), Seq("src"), "left_semi")
      .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
    var nodes = edges.select(col("src").as("node")).distinct()
      .pipe(graft.engine.Checkpoints.iter)
    var nNodes = nodes.count()
    var converged = false
    var rounds = 0
    val maxRounds = 64
    while (!converged && rounds < maxRounds && nNodes > 0) {
      val next = induced(nodes)
        .groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("node"))
        .pipe(graft.engine.Checkpoints.iter)
      val nNext = next.count()
      converged = nNext == nNodes
      nodes = next
      nNodes = nNext
      rounds += 1
      System.err.println(s"[$tag] round $rounds: nodes=$nNext")
    }
    if (!converged && nNodes > 0) throw new IllegalStateException(
      s"$tag peel did not converge in $maxRounds rounds")
    require(rounds <= maxUnroll,
      s"$tag converged in $rounds rounds — beyond the oracle's " +
        s"$maxUnroll-step unrolling; raise KCorePeelUnroll")
    induced(nodes).groupBy(col("src"))
      .agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("node"), col("core_deg"))
  }

  /** The co-supply k-core: [[kcorePeel]] on the symmetrized thresholded
    * co-supply edges (the cached [[cosupplyOriented]] relation carries
    * each undirected edge exactly once — symmetrize and peel).
    */
  private[queries] def kcore(s: SparkSession, dir: String): DataFrame = {
    val o = cosupplyOriented(s, dir)
    val sym = o.select(col("src"), col("dst"))
      .unionAll(o.select(col("dst").as("src"), col("src").as("dst")))
    kcorePeel(sym, KCoreK, maxUnroll = KCorePeelUnroll)
      .select(col("node").as("s_suppkey"), col("core_deg"))
      .orderBy(col("s_suppkey"))
  }

  /** Oracle: the same peel as a fixed-unroll CTE chain over the
    * id-canonical undirected edges — independently re-derived from
    * lineitem (not the degree-oriented relation), so the builder and
    * the peel are both cross-checked. `AS MATERIALIZED` on every level
    * AND on the base relations: each `n{r}` feeds two joins of level
    * r+1, and `es` feeds TWO joins of all ${KCorePeelUnroll}+1 levels —
    * without the hint DuckDB re-ran the co-supply self-join ~25x and
    * spilled the 10x sweep's disk dry (the BPE double-reference rule,
    * applied to every multiply-referenced CTE, not just loop state).
    */
  private def kcoreOracle: String = {
    val sb = new StringBuilder
    sb ++= s"""
      WITH lo AS MATERIALIZED (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      e0 AS MATERIALIZED (
        SELECT a.l_suppkey AS s1, b.l_suppkey AS s2
        FROM lo a JOIN lo b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_suppkey < b.l_suppkey
        GROUP BY 1, 2 HAVING COUNT(*) >= $MinCooccur),
      es AS MATERIALIZED (
        SELECT s1 AS src, s2 AS dst FROM e0
        UNION ALL SELECT s2, s1 FROM e0),
      n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM es)"""
    for (r <- 0 until KCorePeelUnroll) {
      sb ++= s""",
      n${r + 1} AS MATERIALIZED (
        SELECT e.src AS node FROM es e
        JOIN n$r a ON e.src = a.node
        JOIN n$r b ON e.dst = b.node
        GROUP BY 1 HAVING COUNT(*) >= $KCoreK)"""
    }
    sb ++= s"""
      SELECT e.src AS s_suppkey, COUNT(*) AS core_deg
      FROM es e
      JOIN n$KCorePeelUnroll a ON e.src = a.node
      JOIN n$KCorePeelUnroll b ON e.dst = b.node
      GROUP BY 1 ORDER BY 1"""
    sb.toString
  }

  val qKcore = QueryDef("q_kcore", (s, dir) => kcore(s, dir),
    Some(kcoreOracle))

  /** Spread-seed twin of [[ppr]] (soak-only, like [[bfsSpread]]): the
    * restart set covers the same ten suppliers of EVERY key-shifted
    * copy, so the reached set — and with it the per-round state —
    * scales with k instead of staying a single copy's frontier.
    */
  private[graft] def pprSpread(s: SparkSession, dir: String): DataFrame = {
    val (w, deg) = fulfillmentGraph(s, dir)
    pprIterate(w, spreadSeeds(deg, lit(0L)).select(col("node")), Iters)
      .select(
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        call_function("div", col("node"), lit(2)).as("node_key"),
        col("pr"))
      .orderBy(col("node_type"), col("node_key"))
  }

  /** Soak/runtime harness for [[pagerankConverged]] (round-10 advice:
    * the converged shape must be exercised at runtime, not only by the
    * spec). Runs the until-convergence loop on the fulfillment graph,
    * then PINS it bit-exact against the fixed-K declarative chain at
    * the stop round — any divergence between the two iterative regimes
    * fails the soak loudly instead of surfacing as a silent drift.
    * Tolerance is 1% of the seed (converges in a handful of rounds on
    * the driver graphs; data-dependent by design — the soak records
    * the round count via the per-round stderr ledger).
    */
  private[graft] def pagerankConvergedPinned(
      s: SparkSession, dir: String): DataFrame = {
    val (w, deg) = fulfillmentGraph(s, dir)
    val (ranks, rounds) = pagerankConverged(w, deg,
      tolerance = Seed / 100)
    val fixed = pagerankIterate(w, deg, rounds)
    val n = ranks.count()
    val agree = ranks.as("c")
      .join(fixed.as("f"), col("c.node") === col("f.node"))
      .filter(col("c.pr") === col("f.pr")).count()
    require(agree == n && fixed.count() == n,
      s"pagerankConverged diverged from the fixed-K chain at its stop " +
        s"round ($rounds): $agree/$n nodes agree")
    ranks.orderBy(col("node"))
  }

  val all: Seq[QueryDef] =
    Seq(qPagerank, qBfsHops, qCheapestRoute, qComponents, qPpr, qTriangles,
      qKcore)
}
