package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.functions.TextFunctions.h44

/** Scale-technique operators: salting for skewed joins and sketch-based
  * distinct counting — the knobs a 100 TB pipeline reaches for when AQE
  * alone is not enough.
  */
object ScaleQueries {

  private val SaltBuckets = 8

  /** Skew-safe dim join by salting: the fact side's hot keys (5 event
    * types over the whole corpus — maximal skew) are split across
    * [[SaltBuckets]] sub-keys, and the dim side is replicated per salt,
    * so no single task owns a hot key. Results are EXACTLY those of the
    * unsalted join — the oracle is the plain join — salting is pure
    * physical rewiring. (AQE's skew-join handles skewed SHUFFLE
    * partitions; explicit salting remains the tool when a single KEY
    * exceeds what one task should hold.)
    */
  val qSaltedJoin = QueryDef(
    "q_salted_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      // tiny dim derived from the fact's own key domain: per-type weight
      val dim = ev.select(col("event_type")).distinct()
        .withColumn("type_weight", length(col("event_type")).cast("bigint"))
      val salted = ev.select(col("event_type"), cents.as("cents"),
        pmod(col("event_id"), lit(SaltBuckets)).as("salt"))
      val dimSalted = dim.crossJoin(
        s.range(0, SaltBuckets).select(col("id").as("salt")))
      salted.join(dimSalted, Seq("event_type", "salt"))
        .groupBy(col("event_type"), col("type_weight"))
        .agg(count(lit(1)).as("n_events"),
          (sum(col("cents")).cast("double") / 100).as("sum_value"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH dim AS (
        SELECT event_type, CAST(length(event_type) AS BIGINT) AS type_weight
        FROM (SELECT DISTINCT event_type FROM events))
      SELECT e.event_type, d.type_weight, count(*) AS n_events,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100 AS sum_value
      FROM events e JOIN dim d USING(event_type)
      GROUP BY e.event_type, d.type_weight
      ORDER BY e.event_type"""))

  /** HLL++ distinct-count sketch verified against the exact count. The
    * sketch is the 100 TB answer (fixed memory, mergeable across
    * partitions); its estimate is not bit-reproducible in DuckDB, so
    * the query outputs the per-group error-bound VERDICT instead of
    * the estimate: `within_bound` = |approx − exact| ≤ 5% · exact
    * (2.5× the 2% configured rsd — ~σ-level slack, deterministic in
    * practice since the estimator is seed-fixed). The oracle emits the
    * same exact counts with literal TRUE, so the driver hash-matches
    * exactly when the bound holds — the sketch is gate-checked, not
    * trust-me. Pure integer comparison, no float tolerance.
    */
  val qApproxDistinct = QueryDef(
    "q_approx_distinct",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) * 20 <=
          col("exact_users")).as("within_bound"))
      .orderBy(col("event_type")),
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS exact_users,
             TRUE AS within_bound
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** KLL-style quantile sketch (`percentile_approx`, accuracy 1000 —
    * rank error ~1e-3 at ~1/10 the update cost of the 10000 default)
    * — the companion of q_approx_distinct for the second classic
    * sketch a 100 TB pipeline needs (fixed-memory, mergeable across
    * partitions; an exact percentile needs a full sort or all values
    * in memory per group). The sketch value is not bit-reproducible
    * in DuckDB, so the output is the per-group RANK-ERROR verdict:
    * the returned value v occupies the rank interval
    * (count(x < v), count(x ≤ v)]; `pXX_ok` asserts that interval
    * intersects [q·n − εn, q·n + εn] with ε = 0.005 (5× the sketch's
    * configured bound), all in exact integer arithmetic (×1000, no
    * float tolerance). The oracle emits the same groups with literal
    * TRUE — the driver hash-matches exactly when the bound holds.
    *
    * Scale: one sketch pass, then one counting pass against the 3-row
    * broadcast of the sketch values — both plain partial/final hash
    * aggregates over the fact, no sort anywhere.
    */
  val qApproxQuantiles = QueryDef(
    "q_approx_quantiles",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val sk = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.99)), lit(1000)).as("ap"))
        .select(col("l_returnflag"),
          element_at(col("ap"), 1).as("a50"),
          element_at(col("ap"), 2).as("a99"))
      li.join(broadcast(sk), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("l_extendedprice") < col("a50"), 1L).otherwise(0L))
            .as("lt50"),
          sum(when(col("l_extendedprice") <= col("a50"), 1L).otherwise(0L))
            .as("le50"),
          sum(when(col("l_extendedprice") < col("a99"), 1L).otherwise(0L))
            .as("lt99"),
          sum(when(col("l_extendedprice") <= col("a99"), 1L).otherwise(0L))
            .as("le99"))
        .select(col("l_returnflag"), col("n_rows"),
          (col("lt50") * 1000 <= col("n_rows") * 505 &&
            col("le50") * 1000 >= col("n_rows") * 495).as("p50_ok"),
          (col("lt99") * 1000 <= col("n_rows") * 995 &&
            col("le99") * 1000 >= col("n_rows") * 985).as("p99_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag, count(*) AS n_rows,
             TRUE AS p50_ok, TRUE AS p99_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Count-min sketch depth (independent hash rows) and width (buckets
    * per row). 64 buckets is deliberately NARROW for the testdata's 150
    * users so bucket collisions actually occur and the min-over-rows
    * recovery is exercised, not vacuous.
    */
  private val CmDepth = 4
  private val CmWidth = 64L

  /** Count-min sketch expressed in pure relational algebra — the third
    * classic sketch (after HLL and the quantile sketch), and the only
    * one here that is EXACTLY reproducible in SQL, so unlike
    * q_approx_distinct/q_approx_quantiles it gets a full hash-checked
    * oracle. Build: every event lands in [[CmDepth]] (row, bucket)
    * cells keyed by independent md5-derived hashes; the sketch is the
    * d×w cell-count table — fixed memory, mergeable by cell-wise sum
    * across partitions/days, which is the whole 100 TB story (the
    * groupBy collapses map-side to ≤ d·w rows per task). Probe:
    * estimate(u) = min over rows of the u-bucket cell — always ≥ the
    * true count, overcounting only on collisions. Output keeps the
    * exact count next to the estimate so the driver hash pins both the
    * sketch arithmetic and the CM guarantee.
    */
  val qCountMin = QueryDef(
    "q_countmin_est",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"))
      val rows = explode(sequence(lit(0L), lit(CmDepth - 1L))).as("r")
      def bucket(u: org.apache.spark.sql.Column) =
        h44(concat(col("r").cast("string"), lit(":"), u.cast("string"))) % CmWidth
      val cells = ev.select(col("user_id"), rows)
        .select(col("r"), bucket(col("user_id")).as("bucket"))
        .groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cell_n"))
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      val probes = exact.select(col("user_id"), col("exact_n"), rows)
        .select(col("user_id"), col("exact_n"), col("r"),
          bucket(col("user_id")).as("bucket"))
      probes.join(broadcast(cells), Seq("r", "bucket"))
        .groupBy(col("user_id"), col("exact_n"))
        .agg(min(col("cell_n")).as("est_n"))
        .orderBy(col("exact_n").desc, col("user_id"))
        .limit(50)
    },
    Some(s"""
      WITH ev AS (SELECT user_id FROM events),
      rs AS (SELECT unnest(range($CmDepth)) AS r),
      cells AS (
        SELECT r,
               CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 11)) AS BIGINT) % $CmWidth AS bucket,
               count(*) AS cell_n
        FROM ev CROSS JOIN rs GROUP BY 1, 2),
      exact AS (SELECT user_id, count(*) AS exact_n FROM ev GROUP BY 1),
      probes AS (
        SELECT e.user_id, e.exact_n, rs.r,
               CAST(('0x' || substr(md5(CAST(rs.r AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)), 1, 11)) AS BIGINT) % $CmWidth AS bucket
        FROM exact e CROSS JOIN rs)
      SELECT p.user_id, p.exact_n, min(c.cell_n) AS est_n
      FROM probes p JOIN cells c USING (r, bucket)
      GROUP BY p.user_id, p.exact_n
      ORDER BY p.exact_n DESC, p.user_id LIMIT 50"""))

  /** Null-key skew bypass: in an outer join every null key hashes to
    * THE SAME shuffle partition — with a null-heavy foreign key (here a
    * third of orders, simulating unattributed traffic) one task owns
    * the entire null population while the rest idle. The standard fix,
    * demonstrated: route null-key rows AROUND the join entirely (they
    * can never match) and union them back with null-padded join
    * columns. Results are exactly the plain LEFT JOIN's — the oracle IS
    * the plain left join — the rewrite is pure physical rewiring, the
    * null-key sibling of q_salted_join's hot-key salting.
    */
  val qNullSkewJoin = QueryDef(
    "q_null_skew_join",
    (s, dir) => {
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, lit(null).cast("long"))
            .otherwise(col("o_custkey")).as("cust_key"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("cust_key"), col("c_name"))
      val matched = orders.filter(col("cust_key").isNotNull)
        .join(cust, Seq("cust_key"), "left")
      val bypass = orders.filter(col("cust_key").isNull)
        .withColumn("c_name", lit(null).cast("string"))
      matched.unionByName(bypass)
        .groupBy(coalesce(col("c_name"), lit("<unattributed>"))
          .as("customer"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("customer"))
    },
    Some("""
      WITH o AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE o_custkey END AS cust_key
        FROM orders)
      SELECT COALESCE(c.c_name, '<unattributed>') AS customer,
             count(*) AS n_orders
      FROM o LEFT JOIN customer c ON o.cust_key = c.c_custkey
      GROUP BY 1 ORDER BY customer"""))

  /** SKETCH PERSISTENCE — the warehouse pattern the other sketch
    * queries stop short of: build per-DAY HLL sketches (the binary a
    * sketch table stores), then answer the WEEKLY distinct-user
    * question by union-merging the daily sketches WITHOUT touching raw
    * data again. That merge being legal is the whole reason sketch
    * tables exist at 100 TB (re-scanning a quarter of raw events to
    * answer a coarser grain is exactly what a 1000-executor cluster
    * cannot afford daily). Estimates are not bit-reproducible in
    * DuckDB, so per the q_approx_distinct discipline the output is
    * verdicts in exact integer arithmetic: `merged_within_bound` =
    * |merged est − exact| ≤ 5% · exact, and `merge_consistent` =
    * |merged est − direct weekly est| ≤ 2% · exact — the second pins
    * the MERGE itself (a sketch built per-day then unioned estimates
    * like one built directly on the week). Oracle emits the exact
    * weekly counts with literal TRUE twice.
    *
    * Scale: daily sketch build is one map-side-combined aggregate
    * (fixed bytes per (day, task)); the weekly merge aggregates 7
    * sketch rows per output row. The exact countDistinct companions
    * are the verification harness, not the production path.
    */
  val qSketchRollup = QueryDef(
    "q_sketch_rollup",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(date_trunc("week", col("ts")).cast("date").as("week"),
          to_date(col("ts")).as("day"), col("user_id"))
      val daily = ev.groupBy(col("week"), col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = daily.groupBy(col("week"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_est"))
      val direct = ev.groupBy(col("week"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
          .as("direct_est"),
          countDistinct(col("user_id")).as("exact_users"))
      merged.join(direct, Seq("week"))
        .select(col("week"), col("exact_users"),
          (abs(col("merged_est") - col("exact_users")) * 20 <=
            col("exact_users")).as("merged_within_bound"),
          (abs(col("merged_est") - col("direct_est")) * 50 <=
            col("exact_users")).as("merge_consistent"))
        .orderBy(col("week"))
    },
    Some("""
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
             count(DISTINCT user_id) AS exact_users,
             TRUE AS merged_within_bound, TRUE AS merge_consistent
      FROM events GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] =
    Seq(qSaltedJoin, qApproxDistinct, qApproxQuantiles, qCountMin,
      qNullSkewJoin, qSketchRollup)
}
