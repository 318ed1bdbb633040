package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.functions.TextFunctions

/** Round-4 analytic surface: grouping sets, the full window-ranking
  * function family, full-outer joins, correlated subqueries (spark.sql
  * entry point), deterministic stratified sampling, banded edit-distance
  * near-dup verification, and forward-fill imputation — each with a
  * bit-exact DuckDB oracle.
  *
  * Scale notes are per-query; the common theme: every plan is a
  * hash-partitioned aggregate/join or a windowed scan partitioned by a
  * data-scaled key — no global single-partition funnels, no driver-side
  * loops, no cartesian products.
  */
object AnalyticQueries {

  /** GROUPING SETS with grouping_id — the multi-granularity rollup shape
    * (finer than `rollup`/`cube`, which q_rollup_revenue/q_cube_events
    * already cover). One shuffle on the grouping keys; Spark expands the
    * sets map-side (Expand operator), so partial aggregation still
    * applies before the exchange.
    */
  val qGroupingSets = QueryDef(
    "q_grouping_sets",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().cast("long").as("gid"),
          sum(QueryDef.dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select("gid", "l_returnflag", "l_linestatus", "sum_qty", "n")
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY gid, l_returnflag, l_linestatus"""))

  /** The ranking-function family over a partitioned, totally-ordered
    * window: ntile, percent_rank, cume_dist, first/last/nth_value.
    * The order key (c_acctbal, c_custkey) is total, so ties cannot make
    * peer-dependent functions nondeterministic, and the explicit ROWS
    * frame on the value functions pins identical frame semantics in both
    * engines. percent_rank/cume_dist are exact small-integer ratios —
    * bit-identical doubles. Partitioned by mktsegment: parallel across
    * segments, single pass per partition.
    */
  val qWindowRankFns = QueryDef(
    "q_window_rank_fns",
    (s, dir) => {
      val rankW = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val frameW = rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(rankW).cast("long").as("quartile"),
          percent_rank().over(rankW).as("pct_rank"),
          cume_dist().over(rankW).as("cume"),
          first_value(col("c_custkey")).over(frameW).as("seg_first"),
          last_value(col("c_custkey")).over(frameW).as("running_last"),
          nth_value(col("c_custkey"), 2).over(frameW).as("seg_second"))
        .orderBy(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume,
             first_value(c_custkey) OVER wf AS seg_first,
             last_value(c_custkey) OVER wf AS running_last,
             nth_value(c_custkey, 2) OVER wf AS seg_second
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
             wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY c_mktsegment, c_acctbal, c_custkey"""))

  /** FULL OUTER join — demand-side vs supply-side per-nation rollups
    * where either side may be absent (suppliers exist in few nations at
    * small SF). Keys are coalesced so the output key is total. Both
    * inputs pre-aggregate before the join (count per nationkey), so the
    * join is tiny regardless of fact scale — aggregate-then-join, never
    * join-then-aggregate.
    */
  val qFullOuter = QueryDef(
    "q_full_outer",
    (s, dir) => {
      val custs = t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
      val supps = t(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("nk2")).agg(count(lit(1)).as("n_supp"))
      custs.join(supps, col("nk") === col("nk2"), "full_outer")
        .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    },
    Some("""
      SELECT COALESCE(c.nk, s.nk2) AS nationkey,
             COALESCE(c.n_cust, 0) AS n_cust,
             COALESCE(s.n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
            FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey AS nk2, count(*) AS n_supp
                       FROM supplier GROUP BY 1) s
        ON c.nk = s.nk2
      ORDER BY nationkey"""))

  /** Correlated scalar subquery + EXISTS through the spark.sql entry
    * point (the API surface a reference user's ad-hoc SQL hits):
    * per-nation top-balance customers that have at least one order.
    * Catalyst decorrelates both subqueries into aggregate + semi joins —
    * no per-row re-execution, unlike the reference's row-at-a-time
    * Python. Doubles are compared, never aggregated, so the oracle
    * hash-matches.
    */
  val qCorrelatedSubquery = QueryDef(
    "q_correlated_subquery",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
        FROM customer_v c
        WHERE c.c_acctbal = (SELECT max(c2.c_acctbal) FROM customer_v c2
                             WHERE c2.c_nationkey = c.c_nationkey)
          AND EXISTS (SELECT 1 FROM orders_v o
                      WHERE o.o_custkey = c.c_custkey)
        ORDER BY c.c_custkey""")
    },
    Some("""
      SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
      FROM customer c
      WHERE c.c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        AND EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey)
      ORDER BY c.c_custkey"""))

  /** Deterministic stratified sampling — the training-data curation
    * primitive (downsample over-represented strata without a seed-drift
    * hazard between runs). Membership is a pure function of the row key
    * (44-bit md5 bucket mod 100 vs a per-stratum rate), so the sample is
    * reproducible across engines, runs, and cluster sizes — no
    * `TABLESAMPLE`/`rand()` nondeterminism — and embarrassingly parallel
    * (a codegen'd filter over the scan, no shuffle at all).
    */
  val qSampleStratified = QueryDef(
    "q_sample_stratified",
    (s, dir) => t(s, dir, "documents")
      .withColumn("bucket",
        pmod(TextFunctions.h44(concat(lit("smp|"), col("doc_id").cast("string"))),
          lit(100L)))
      .filter(col("bucket") <
        when(col("lang") === "en", lit(30L)).otherwise(lit(10L)))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id, lang, ${TextFunctions.h44Sql("'smp|' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents
      WHERE ${TextFunctions.h44Sql("'smp|' || CAST(doc_id AS VARCHAR)")} % 100 <
            CASE WHEN lang = 'en' THEN 30 ELSE 10 END
      ORDER BY doc_id"""))

  /** Edit-distance near-dup verification over banded candidate pairs:
    * same-lang docs within ±2 chars of each other, Levenshtein on a
    * fixed 40-char prefix. This is the "verify" stage of a dedup
    * pipeline — at 100 TB the candidate set comes from MinHash-LSH
    * buckets (q_dedup_minhash), never from an all-pairs join. The
    * length band is part of the EQUI key, not a residual: bucket =
    * n_chars div 3 (width ≥ band+1), side a replicated to the three
    * neighbor buckets, so |a−b| ≤ 2 ⇒ exactly one bucket match. With
    * lang alone as the key (the pre-round-8 form), hash-probe cost is
    * Θ(docs-per-lang) per row — quadratic in the corpus; keyed on
    * (lang, bucket) it tracks the candidate count (docs per lang per
    * 3-char slice). The 10× sweep caught this: 15+ min → ~1 s. The
    * O(len²) DP then runs only on band survivors, on a constant-size
    * prefix, so per-pair cost is bounded.
    */
  val qEditDistance = QueryDef(
    "q_edit_distance",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          substring(col("text"), 1, 40).as("pfx"))
      val bkt = floor(col("n_chars") / 3)
      val a = docs.select(col("doc_id").as("a_id"), col("lang"),
          col("n_chars").as("a_len"), col("pfx").as("a_pfx"),
          explode(array(bkt - 1, bkt, bkt + 1)).as("a_bkt"))
      val b = docs.select(col("doc_id").as("b_id"), col("lang").as("lang2"),
        col("n_chars").as("b_len"), col("pfx").as("b_pfx"), bkt.as("b_bkt"))
      a.join(b, col("lang") === col("lang2") && col("a_bkt") === col("b_bkt") &&
          col("a_id") < col("b_id") &&
          abs(col("a_len") - col("b_len")) <= lit(2L))
        .select(col("a_id"), col("b_id"), col("lang"),
          levenshtein(col("a_pfx"), col("b_pfx")).cast("long").as("dist"))
        .filter(col("dist") <= 27)
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.lang,
             CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS BIGINT) AS dist
      FROM documents a JOIN documents b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
       AND abs(a.n_chars - b.n_chars) <= 2
      WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 27
      ORDER BY a_id, b_id"""),
    bench = false)

  /** Forward-fill imputation (time-series gap fill): carry each user's
    * last purchase value forward across subsequent events —
    * `last(..., ignoreNulls)` over a running ROWS frame, the standard
    * Spark idiom for LOCF. Partitioned by user: scales with user count,
    * one sort per user partition, no global window.
    */
  val qForwardFill = QueryDef(
    "q_forward_fill",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("last_purchase",
          last(when(col("event_type") === "purchase", col("value")),
            ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"), col("last_purchase"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'purchase' THEN value END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_purchase
      FROM events
      ORDER BY user_id, ts, event_id"""))

  /** UNPIVOT (wide → long reshape) — the inverse of q_pivot: part
    * measures melt into (attr, val) rows via the native Unpivot plan
    * node (one Expand, no shuffle), not a hand-rolled union of selects.
    */
  val qUnpivot = QueryDef(
    "q_unpivot",
    (s, dir) => t(s, dir, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "attr", "val")
      .orderBy(col("p_partkey"), col("attr")),
    Some("""
      SELECT p_partkey, attr, val
      FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size,
                   p_retailprice FROM part)
           UNPIVOT INCLUDE NULLS (val FOR attr IN (p_size, p_retailprice))
      ORDER BY p_partkey, attr"""))

  /** Histogram binning in plain integer arithmetic (DuckDB 1.0 has no
    * width_bucket): 5-unit quantity bins with explicit bounds-clamping.
    * The canonical distribution-profiling rollup — one partial/final
    * aggregate over the scan, bin count constant.
    */
  val qHistogram = QueryDef(
    "q_histogram",
    (s, dir) => t(s, dir, "lineitem")
      .select((floor(col("l_quantity") / 5).cast("long")).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", (col("bin") * 5).cast("double"))
      .select(col("bin"), col("bin_lo"), col("n"))
      .orderBy(col("bin")),
    Some("""
      SELECT bin, CAST(bin * 5 AS DOUBLE) AS bin_lo, count(*) AS n
      FROM (SELECT CAST(floor(l_quantity / 5) AS BIGINT) AS bin FROM lineitem)
      GROUP BY bin ORDER BY bin"""))

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — "top-2
    * customers per nation" written the way an analyst writes it.
    * Catalyst decorrelates the per-row subquery into
    * WindowGroupLimit → row_number window → equi-join: the lateral
    * NEVER re-executes per outer row (the reference's Python-loop
    * analogue), and WindowGroupLimit keeps only k rows per key on the
    * map side BEFORE the shuffle — the same physical shape as the
    * hand-written q_topk_per_group, derived automatically from the
    * declarative form.
    */
  val qLateralTopk = QueryDef(
    "q_lateral_topk",
    (s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("nation_v")
      t(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT n_name, t.c_name, t.c_acctbal
        FROM nation_v,
        LATERAL (SELECT c_name, c_acctbal FROM customer_v
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        ORDER BY n_name, c_acctbal DESC, c_name""")
    },
    Some("""
      SELECT n_name, t.c_name, t.c_acctbal
      FROM nation,
      LATERAL (SELECT c_name, c_acctbal FROM customer
               WHERE c_nationkey = n_nationkey
               ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      ORDER BY n_name, c_acctbal DESC, c_name"""))

  /** Incremental re-aggregation: merge persisted daily partials into a
    * monthly rollup WITHOUT touching raw events — the pre-aggregation
    * pattern every large warehouse runs (aggregate once per day, merge
    * partials for any coarser grain). Sums and counts are algebraic so
    * they merge exactly; the monthly average is re-derived from merged
    * sum/count — never an average of averages. At 100 TB the daily
    * layer is what's stored; the monthly merge reads 30 pre-aggregated
    * rows per (day, type), not 30 days of raw events.
    */
  val qRollupMerge = QueryDef(
    "q_rollup_merge",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(sum(cents).as("cents"), count(lit(1)).as("n"))
      daily
        .groupBy(date_trunc("month", col("day")).cast("date").as("month"),
          col("event_type"))
        .agg((sum(col("cents")).cast("double") / 100).as("sum_value"),
          sum(col("n")).as("n_events"),
          (sum(col("cents")).cast("double") / sum(col("n")) / 100).as("avg_value"))
        .orderBy(col("month"), col("event_type"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents,
               count(*) AS n
        FROM events GROUP BY 1, 2)
      SELECT CAST(date_trunc('month', day) AS DATE) AS month, event_type,
             CAST(SUM(cents) AS DOUBLE) / 100 AS sum_value,
             -- DuckDB SUM(BIGINT) widens to HUGEINT; pin the driver-visible type
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(SUM(cents) AS DOUBLE) / CAST(SUM(n) AS BIGINT) / 100 AS avg_value
      FROM daily GROUP BY 1, 2
      ORDER BY month, event_type"""))

  /** Winsorization (percentile outlier clamp): per (returnflag,
    * linestatus) group, prices are clamped to the [p05, p95] band before
    * re-aggregation — the standard robust-stats move before training-data
    * statistics. The bounds are DISCRETE rank statistics computed in pure
    * integer math (value at rank ceil(0.05·n) / ceil(0.95·n) of the
    * sorted cents), not interpolated quantiles: rank extraction keeps
    * every intermediate a BIGINT, so the clamped sum is exact and
    * hash-stable under any partial-aggregation order (an interpolated
    * bound would inject an order-sensitive double into the sum).
    *
    * Shape: [[graft.engine.GroupedQuantiles.winsorizedSum]] — the
    * two-phase histogram refinement of the round-5 rework, FUSED
    * (round 19): the clamped sum is assembled from the same two fact
    * passes that locate the p05/p95 bounds (phase-1 coarse histogram +
    * phase-2 boundary-bucket refine, both now carrying value sums
    * alongside counts), so the third fact pass — re-scan, broadcast
    * the 6-row bounds back on, clamp, aggregate — is gone. Every
    * shuffle stays histogram-sized; the fact is scanned exactly twice,
    * the structural minimum for an exact rank bound plus a corrected
    * sum. (History: the round-5 form ranked DISTINCT (group, cents)
    * values — near-continuous prices made that fact-sized; round 18
    * measured 2.1 s of its 2.7 s in that distinct-shuffle+window.)
    */
  val qWinsorize = QueryDef(
    "q_winsorize",
    (s, dir) => {
      val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), cents.as("cents"))
      graft.engine.GroupedQuantiles.winsorizedSum(li,
        Seq("l_returnflag", "l_linestatus"), "cents",
        graft.engine.GroupedQuantiles.Q("lo", 5, 100),
        graft.engine.GroupedQuantiles.Q("hi", 95, 100))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("n").as("n_rows"),
          (col("wsum").cast("double") / 100).as("sum_winsorized"),
          (col("lo").cast("double") / 100).as("winsor_lo"),
          (col("hi").cast("double") / 100).as("winsor_hi"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      WITH li AS (
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM lineitem),
      g AS (SELECT l_returnflag, l_linestatus, count(*) AS n
            FROM li GROUP BY 1, 2),
      r AS (SELECT l_returnflag, l_linestatus, cents,
                   CAST(row_number() OVER (PARTITION BY l_returnflag, l_linestatus
                                           ORDER BY cents) AS BIGINT) AS rn
            FROM li),
      b AS (SELECT r.l_returnflag, r.l_linestatus,
                   min(CASE WHEN rn = (n * 5 + 99) // 100 THEN cents END) AS lo,
                   min(CASE WHEN rn = (n * 95 + 99) // 100 THEN cents END) AS hi
            FROM r JOIN g USING (l_returnflag, l_linestatus)
            GROUP BY 1, 2)
      SELECT li.l_returnflag, li.l_linestatus,
             count(*) AS n_rows,
             CAST(SUM(LEAST(GREATEST(cents, lo), hi)) AS DOUBLE) / 100 AS sum_winsorized,
             CAST(min(lo) AS DOUBLE) / 100 AS winsor_lo,
             CAST(min(hi) AS DOUBLE) / 100 AS winsor_hi
      FROM li JOIN b USING (l_returnflag, l_linestatus)
      GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus"""))

  /** Exact covariance/correlation per group, computed from algebraic
    * moment sums (n, Σx, Σy, Σxy, Σx², Σy²) held in exact decimals —
    * the mergeable map-side form (each partial is six numbers).
    * `covar_pop`/`corr` built-ins sum doubles in partition order and
    * would NOT hash-match.
    *
    * Hash-exactness: the cancellation-prone difference `n·Σxy − Σx·Σy`
    * is computed IN DECIMAL (casting the two big products to double
    * first loses different ULPs per engine). The engine side then casts
    * the exact ×10⁴ DECIMAL(38,0) integer straight to double — Spark's
    * Decimal→double is correctly rounded at any magnitude. DuckDB's
    * decimal→double is NOT (double-rounds once the int128 payload
    * passes 2⁵³; measured at sf0.1), and the earlier BIGINT hop in the
    * oracle overflowed at the 10× sweep (sf~1: scaled diff 3.7·10¹⁹ >
    * 2⁶³), so the oracle now rebuilds the double from an exact 2³²
    * split — hi·2³² + lo, both addends exact, one ties-to-even rounding
    * — correct to |scaled diff| < 2⁸⁵ (TPC-H sf ~10⁴). The engine side
    * has no such bound.
    */
  val qCovariance = QueryDef(
    "q_covariance",
    (s, dir) => {
      val q = QueryDef.dec(col("l_quantity"))
      val p = QueryDef.dec(col("l_extendedprice"))
      val d = QueryDef.dec(col("l_discount"))
      def d324(c: Column) = c.cast("decimal(32,4)")
      // scale-4 decimal → its exact ×10⁴ integer (see select comment)
      def s38(c: Column) = (c * 10000).cast("decimal(38,0)")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("decimal(12,0)").as("n"),
          sum(q).cast("decimal(19,2)").as("sq"),
          sum(p).cast("decimal(19,2)").as("sp"),
          sum(d).cast("decimal(19,2)").as("sd"),
          sum((q * q).cast("decimal(18,4)")).cast("decimal(19,4)").as("sqq"),
          sum((d * d).cast("decimal(18,4)")).cast("decimal(19,4)").as("sdd"),
          sum((q * p).cast("decimal(28,4)")).cast("decimal(26,4)").as("sqp"),
          sum((q * d).cast("decimal(18,4)")).cast("decimal(19,4)").as("sqd"))
        .select(
          col("l_returnflag"),
          col("n").cast("bigint").as("n"),
          // ×10⁴ lifts each scale-4 difference to an EXACT integer
          // before any double conversion: DuckDB's decimal→double is
          // double-rounded once the int128 payload passes 2⁵³
          // (measured: cov off by an ulp at sf0.1), but an int64→double
          // is correctly rounded in both engines. The 10⁴ moves into
          // the cov denominator and cancels inside corr's ratio.
          (s38(d324(col("n") * col("sqp")) - d324(col("sq") * col("sp")))
            .cast("double") /
            ((col("n") * col("n")).cast("double") * 1e4))
            .as("cov_qty_price"),
          (s38(d324(col("n") * col("sqd")) - d324(col("sq") * col("sd")))
            .cast("double") /
            sqrt(s38(d324(col("n") * col("sqq")) - d324(col("sq") * col("sq")))
              .cast("double") *
              s38(d324(col("n") * col("sdd")) - d324(col("sd") * col("sd")))
                .cast("double"))).as("corr_qty_disc"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH m AS (
        -- widths ≥ 19 force DuckDB's int128 multiply path (an 18-digit
        -- pair multiplies in int64 and overflows); every product below
        -- stays within the 38-digit combined-width limit
        SELECT l_returnflag,
               CAST(count(*) AS DECIMAL(12,0)) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(19,2)) AS sq,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(19,2)) AS sp,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(19,2)) AS sd,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
                        CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)))
                    AS DECIMAL(19,4)) AS sqq,
               CAST(SUM(CAST(CAST(l_discount AS DECIMAL(18,2)) *
                        CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)))
                    AS DECIMAL(19,4)) AS sdd,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
                        CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4)))
                    AS DECIMAL(26,4)) AS sqp,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
                        CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)))
                    AS DECIMAL(19,4)) AS sqd
        FROM lineitem GROUP BY l_returnflag)
      , d AS (
        -- x10000 lifts each scale-4 difference to an exact DECIMAL(38,0)
        -- integer before any double conversion (see Spark-side comment)
        SELECT l_returnflag, n,
               CAST((CAST(n * sqp AS DECIMAL(32,4)) -
                     CAST(sq * sp AS DECIMAL(32,4))) * 10000 AS DECIMAL(38,0)) AS dqp,
               CAST((CAST(n * sqd AS DECIMAL(32,4)) -
                     CAST(sq * sd AS DECIMAL(32,4))) * 10000 AS DECIMAL(38,0)) AS dqd,
               CAST((CAST(n * sqq AS DECIMAL(32,4)) -
                     CAST(sq * sq AS DECIMAL(32,4))) * 10000 AS DECIMAL(38,0)) AS dqq,
               CAST((CAST(n * sdd AS DECIMAL(32,4)) -
                     CAST(sd * sd AS DECIMAL(32,4))) * 10000 AS DECIMAL(38,0)) AS ddd
        FROM m),
      -- Correctly-rounded decimal->double: DuckDB's native int128->double
      -- double-rounds past 2^53, and a BIGINT hop overflows past 2^63
      -- (the 10x sweep caught exactly that at sf~1: dqp = 3.7e19). Split
      -- at 2^32 instead: lo = |D| mod 2^32 (exact), hi = (|D|-lo)/2^32
      -- (exact multiple division), then hi*2^32 + lo in doubles — both
      -- addends exact while hi < 2^53, so the single addition rounds
      -- once, ties-to-even, matching Spark's Decimal->double to |D| < 2^85
      -- (TPC-H sf ~10^4; verified value-for-value vs Python's float()).
      sp1 AS (
        SELECT l_returnflag, n, dqp, dqd, dqq, ddd,
               abs(dqp) % 4294967296 AS lqp, abs(dqd) % 4294967296 AS lqd,
               abs(dqq) % 4294967296 AS lqq, abs(ddd) % 4294967296 AS ldd
        FROM d),
      sp2 AS (
        SELECT l_returnflag, n, dqp, dqd, dqq, ddd, lqp, lqd, lqq, ldd,
               CAST((abs(dqp) - lqp) / 4294967296 AS DECIMAL(38,0)) AS hqp,
               CAST((abs(dqd) - lqd) / 4294967296 AS DECIMAL(38,0)) AS hqd,
               CAST((abs(dqq) - lqq) / 4294967296 AS DECIMAL(38,0)) AS hqq,
               CAST((abs(ddd) - ldd) / 4294967296 AS DECIMAL(38,0)) AS hdd
        FROM sp1),
      v AS (
        SELECT l_returnflag, n,
               (CASE WHEN dqp < 0 THEN -1 ELSE 1 END) *
                 (CAST(hqp AS DOUBLE) * 4294967296 + CAST(lqp AS DOUBLE)) AS vqp,
               (CASE WHEN dqd < 0 THEN -1 ELSE 1 END) *
                 (CAST(hqd AS DOUBLE) * 4294967296 + CAST(lqd AS DOUBLE)) AS vqd,
               (CASE WHEN dqq < 0 THEN -1 ELSE 1 END) *
                 (CAST(hqq AS DOUBLE) * 4294967296 + CAST(lqq AS DOUBLE)) AS vqq,
               (CASE WHEN ddd < 0 THEN -1 ELSE 1 END) *
                 (CAST(hdd AS DOUBLE) * 4294967296 + CAST(ldd AS DOUBLE)) AS vdd
        FROM sp2)
      SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             vqp / (CAST(n * n AS DOUBLE) * 1e4) AS cov_qty_price,
             vqd / sqrt(vqq * vdd) AS corr_qty_disc
      FROM v ORDER BY l_returnflag"""))

  /** Equi-depth (equal-count) histogram via NTILE over a fully
    * deterministic total order — the complement of q_histogram's
    * equi-width binning. The NTILE runs as
    * [[graft.engine.DistributedRank]]: a range-partitioned sort over
    * the fact plus per-partition offset scans, so no single task ever
    * holds the relation (a plain `ntile().over(Window.orderBy(...))`
    * would). An alternative 100 TB shape derives cut points from the
    * quantile sketch (q_approx_quantiles) and bins with a scan-only
    * CASE — approximate bucket counts where this one is exact.
    */
  val qHistogramEquidepth = QueryDef(
    "q_histogram_equidepth",
    (s, dir) => {
      val keys = Seq(
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      val binned = graft.engine.DistributedRank.ntile(
        t(s, dir, "lineitem")
          .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
        keys, 10, "bucket")
      binned
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        .orderBy(col("bucket"))
    },
    Some("""
      SELECT bucket, count(*) AS n_rows,
             min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      FROM (SELECT l_extendedprice,
                   CAST(ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                                        l_linenumber) AS BIGINT) AS bucket
            FROM lineitem)
      GROUP BY bucket ORDER BY bucket"""))

  /** Percent-of-total contribution: each nation's revenue share within
    * its region — the window-over-aggregate report every BI tool calls
    * "% of parent". Revenue reduces to exact cents FIRST (one hash
    * aggregate over the fact), the window then runs over the 25-row
    * aggregate, partitioned by region — window input is |nations|,
    * never |lineitem|. Share is the single final int→double division.
    */
  val qPctOfTotal = QueryDef(
    "q_pct_of_total",
    (s, dir) => {
      val cents = (QueryDef.dec(col("l_extendedprice")) * 100).cast("bigint")
      val rev = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(cents).as("cents"))
      rev
        .withColumn("region_cents", sum(col("cents")).over(
          Window.partitionBy(col("r_name"))))
        .select(col("r_name"), col("n_name"),
          (col("cents").cast("double") / 100).as("revenue"),
          (col("cents").cast("double") / col("region_cents")).as("share"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""
      WITH rev AS (
        SELECT r_name, n_name,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2)
      SELECT r_name, n_name,
             CAST(cents AS DOUBLE) / 100 AS revenue,
             CAST(cents AS DOUBLE) /
               CAST(SUM(cents) OVER (PARTITION BY r_name) AS DOUBLE) AS share
      FROM rev ORDER BY r_name, n_name"""))

  /** ABC (Pareto) classification: rank parts by revenue and classify
    * into A (first 80% of cumulative revenue), B (next 15%), C (tail) —
    * the inventory-analysis classic. Money is exact integer cents end
    * to end; class boundaries are integer comparisons on `cum_before`
    * (the mass STRICTLY before the part), so the boundary part lands in
    * the class its prefix belongs to — no float thresholds anywhere.
    * Output is the per-class rollup (n_parts, revenue, share).
    *
    * Scale: revenue-per-part is a map-side-combinable aggregate; the
    * ordered cumsum is [[graft.engine.DistributedRank]] (two-phase
    * range-partitioned, no single-task window even at a billion
    * parts), and the grand total falls out of its phase-1 stats as a
    * literal — the per-part aggregate is evaluated ONCE (the previous
    * `crossJoin(broadcast(rev.agg(...)))` form evaluated it twice).
    */
  val qAbcClassification = QueryDef(
    "q_abc_classification",
    (s, dir) => {
      val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
      val rev = t(s, dir, "lineitem")
        .select(col("l_partkey"), cents.as("cents"))
        .groupBy(col("l_partkey")).agg(sum(col("cents")).as("cents"))
      // boundary products in DECIMAL(38,0): cum×100 exceeds Long range
      // once total revenue passes ~9e16 cents (ANSI would raise)
      val d38 = (c: Column) => c.cast("decimal(38,0)")
      graft.engine.DistributedRank(rev,
        Seq(col("cents").desc, col("l_partkey")),
        graft.engine.DistributedRank.Spec(valueCol = Some("cents"),
          cumCol = Some("cum"), totalCol = Some("total")))
        .withColumn("cls",
          when(d38(col("cum") - col("cents")) * 100 <
            d38(col("total")) * 80, "A")
            .when(d38(col("cum") - col("cents")) * 100 <
              d38(col("total")) * 95, "B")
            .otherwise("C"))
        .groupBy(col("cls"))
        .agg(count(lit(1)).as("n_parts"),
          (sum(col("cents")).cast("double") / 100).as("revenue"),
          (sum(col("cents")).cast("double") / max(col("total")))
            .as("share"))
        .orderBy(col("cls"))
    },
    Some("""
      WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                 AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY l_partkey),
      tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM rev),
      c AS (
        SELECT cents,
               CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum
        FROM rev),
      cls AS (
        SELECT cents,
               CASE WHEN CAST(cum - cents AS HUGEINT) * 100
                      < CAST((SELECT total FROM tot) AS HUGEINT) * 80
                      THEN 'A'
                    WHEN CAST(cum - cents AS HUGEINT) * 100
                      < CAST((SELECT total FROM tot) AS HUGEINT) * 95
                      THEN 'B'
                    ELSE 'C' END AS cls
        FROM c)
      SELECT cls, count(*) AS n_parts,
             CAST(SUM(cents) AS DOUBLE) / 100 AS revenue,
             CAST(SUM(cents) AS DOUBLE) / (SELECT total FROM tot) AS share
      FROM cls GROUP BY cls ORDER BY cls"""))

  /** Benford first-digit audit: the leading-digit distribution of order
    * totals against Benford's expectation — the forensic-accounting
    * screen for fabricated or systematically clipped monetary data.
    * Digits are extracted from the exact cents integer (never from a
    * formatted float); counts are exact, the share is one final double
    * division. (TPC-H prices are uniform-ish, so the point here is the
    * OPERATOR and the deviation report, not a Benford fit.)
    *
    * Scale: pure per-row arithmetic into a 9-row aggregate — map-side
    * combine does all the work; the denominator re-aggregates the same
    * 9-row shuffle output (AQE reuses the exchange), never a second
    * scan and never a global window.
    */
  val qBenfordAudit = QueryDef(
    "q_benford_audit",
    (s, dir) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
      val counts = t(s, dir, "orders")
        .select(substring(cents.cast("string"), 1, 1).cast("bigint")
          .as("lead_digit"))
        .groupBy(col("lead_digit")).agg(count(lit(1)).as("n"))
      // the denominator re-aggregates the ≤9-row digit counts; both
      // consumers hang off the SAME partial-agg shuffle, so the orders
      // scan runs once (ReusedExchange) — no global window needed
      counts
        .crossJoin(broadcast(counts.agg(sum(col("n")).as("tot"))))
        .select(col("lead_digit"), col("n"),
          (col("n").cast("double") / col("tot")).as("share"))
        .orderBy(col("lead_digit"))
    },
    Some("""
      WITH d AS (
        SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                 * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
               AS lead_digit
        FROM orders),
      g AS (SELECT lead_digit, count(*) AS n FROM d GROUP BY lead_digit)
      SELECT lead_digit, n,
             CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS BIGINT) AS share
      FROM g ORDER BY lead_digit"""))

  val all: Seq[QueryDef] = Seq(qPctOfTotal, qGroupingSets, qWindowRankFns, qFullOuter,
    qCorrelatedSubquery, qSampleStratified, qEditDistance, qForwardFill,
    qUnpivot, qHistogram, qLateralTopk, qRollupMerge, qWinsorize,
    qCovariance, qHistogramEquidepth, qAbcClassification, qBenfordAudit)
}
