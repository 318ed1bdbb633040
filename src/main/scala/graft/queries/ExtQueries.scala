package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.functions.TextFunctions._

/** Extension-surface operators beyond the reference (SURVEY §2 "extension"
  * rows): SimHash near-dup pairs via byte banding, rollup subtotals,
  * calendar extraction, and session windows.
  */
object ExtQueries {

  /** SimHash near-dup pairs with hamming ≤ 3, found by 4×8-bit banding:
    * pigeonhole guarantees any pair within distance 3 shares at least one
    * of the 4 bands, so the equi-join on (band, byte) finds ALL such
    * pairs — bucket-local work only, never all-pairs (the same 100 TB
    * blocking discipline as the MinHash path).
    */
  val qSimhashPairs = QueryDef(
    "q_simhash_pairs",
    (s, dir) => {
      val sim = t(s, dir, "documents")
        .select(col("doc_id"),
          transform(array_distinct(words(col("text"))), w => h44(w)).as("hs"))
        .select(col("doc_id"), simhash32("hs").as("sim"))
      val bands = sim.select(col("doc_id"), col("sim"),
        explode(array((0 until 4).map(m =>
          struct(lit(m).as("m"),
            shiftright(col("sim"), m * 8).bitwiseAND(255).as("bkey"))): _*)).as("b"))
        .select(col("doc_id"), col("sim"), col("b.m"), col("b.bkey"))
      val a = bands.select(col("m"), col("bkey"), col("doc_id").as("doc_a"),
        col("sim").as("sim_a"))
      val b = bands.select(col("m"), col("bkey"), col("doc_id").as("doc_b"),
        col("sim").as("sim_b"))
      a.join(b, Seq("m", "bkey")).filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
        .distinct()
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int").as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      WITH sim AS (
        SELECT doc_id, ${simhash32Sql(s"list_transform(list_distinct(${wordsSql("text")}), w -> ${h44Sql("w")})")} AS sim
        FROM documents),
      bands AS (
        SELECT doc_id, sim, m, (sim >> (m * 8)) & 255 AS bkey
        FROM sim, (SELECT unnest([0, 1, 2, 3]) AS m)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.sim AS sim_a, b.sim AS sim_b
        FROM bands a JOIN bands b ON a.m = b.m AND a.bkey = b.bkey
                                 AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
             CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
      FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= 3
      ORDER BY doc_a, doc_b"""),
    bench = false)

  /** A8 extension: ROLLUP subtotals with labeled grand-total rows. */
  val qRollup = QueryDef(
    "q_rollup_revenue",
    (s, dir) => t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        QueryDef.dec(col("l_extendedprice")).as("price"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("price")).cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("revenue"), col("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
             coalesce(l_linestatus, 'ALL') AS l_linestatus,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS n
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag, l_linestatus"""))

  /** A8 extension: full CUBE (all 4 grouping sets) over (type, day) with
    * labeled subtotal rows and exact-cents money math.
    */
  val qCube = QueryDef(
    "q_cube_events",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      t(s, dir, "events")
        .select(col("event_type"), dayofmonth(col("ts")).cast("int").as("d"),
          cents.as("cents"))
        .cube(col("event_type"), col("d"))
        .agg(count(lit(1)).as("n_events"),
          (sum(col("cents")).cast("double") / 100).as("sum_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("d"), lit(-1)).as("d"),
          col("n_events"), col("sum_value"))
        .orderBy(col("event_type"), col("d"))
    },
    Some("""
      SELECT coalesce(event_type, 'ALL') AS event_type,
             coalesce(CAST(day(ts) AS INTEGER), -1) AS d,
             count(*) AS n_events,
             CAST(CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS DOUBLE) / 100 AS sum_value
      FROM events
      GROUP BY CUBE(event_type, CAST(day(ts) AS INTEGER))
      ORDER BY event_type, d"""))

  /** F-surface extension: calendar-part extraction + grouped counts. */
  val qDateParts = QueryDef(
    "q_date_parts",
    (s, dir) => t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("int").as("y"),
        quarter(col("o_orderdate")).cast("int").as("q"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("y"), col("q")),
    Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
             CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q,
             count(*) AS n_orders
      FROM orders GROUP BY 1, 2 ORDER BY y, q"""))

  /** §2.8 extension: session windows (30-minute inactivity gap) per user
    * over the events stream-table. The DuckDB mirror is the classic
    * gaps-and-islands rewrite (lag → new-session flag → running sum),
    * matching Spark's strict gap semantics (a gap of exactly 30 minutes
    * starts a new session).
    */
  val qSessionWindows = QueryDef(
    "q_session_windows",
    (s, dir) => t(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start")),
    Some("""
      WITH m AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      g AS (
        SELECT *, SUM(new_s) OVER (
          PARTITION BY user_id ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS sid
        FROM m)
      SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
             count(*) AS n_events
      FROM g GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  /** Statistical aggregates in exact integer arithmetic: population mean
    * and variance from (n, Σx, Σx²) in cents — the one-pass formula
    * every engine vectorizes, with the float conversion done once at the
    * end so both engines emit identical doubles (Welford-style running
    * floats would NOT hash-match across engines).
    */
  val qStatsVariance = QueryDef(
    "q_stats_variance",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      t(s, dir, "events")
        .select(col("event_type"), cents.as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
          sum(col("c") * col("c")).as("s2"))
        .select(col("event_type"), col("n"),
          (col("s1").cast("double") / col("n") / 100).as("mean_value"),
          ((col("s2").cast("double") / col("n") -
            (col("s1").cast("double") / col("n")) *
            (col("s1").cast("double") / col("n"))) / 10000).as("var_value"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH g AS (
        SELECT event_type, count(*) AS n,
               CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c * c) AS BIGINT) AS s2
        FROM (SELECT event_type,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
              FROM events)
        GROUP BY event_type)
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / n / 100 AS mean_value,
             (CAST(s2 AS DOUBLE) / n -
              (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) / 10000 AS var_value
      FROM g ORDER BY event_type"""))

  /** Deterministic array aggregation: collect + sort, the only
    * hash-stable form of `collect_list` (unsorted collection order is
    * partition-dependent). The list is emitted as a `,`-joined string:
    * the comparison harness row-sorts result values, and raw array cells
    * are unsortable there, while the string form is — with no loss, since
    * the digits round-trip exactly.
    */
  val qCollectSorted = QueryDef(
    "q_collect_sorted",
    (s, dir) => t(s, dir, "events")
      .filter(col("user_id") < 20)
      .groupBy(col("user_id"))
      .agg(concat_ws(",",
        array_sort(collect_list(col("event_id")))).as("event_ids"))
      .orderBy(col("user_id")),
    Some("""
      SELECT user_id,
             array_to_string(list_sort(list(event_id)), ',') AS event_ids
      FROM events WHERE user_id < 20
      GROUP BY user_id ORDER BY user_id"""))

  /** Exact percentiles: Spark `percentile` and DuckDB `quantile_cont`
    * share the (n-1)*p linear-interpolation definition, and on exact
    * integer cents the doubles agree bitwise.
    *
    * Scale: computed via [[graft.engine.GroupedQuantiles.interpolated]]
    * (histogram refinement, same double formula) rather than the
    * built-in `percentile` aggregate, whose buffer is a per-group
    * value→count map materialized in ONE reducer — for near-continuous
    * cents that map scales with the data, an executor-memory hazard
    * the histogram passes never hit.
    */
  val qPercentiles = QueryDef(
    "q_percentiles",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      graft.engine.GroupedQuantiles.interpolated(
        t(s, dir, "events").select(col("event_type"), cents.as("c")),
        Seq("event_type"), "c", Seq("p50" -> 0.5, "p90" -> 0.9))
        .select(col("event_type"),
          (col("p50") / 100).as("p50_value"),
          (col("p90") / 100).as("p90_value"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type,
             quantile_cont(c, 0.5) / 100 AS p50_value,
             quantile_cont(c, 0.9) / 100 AS p90_value
      FROM (SELECT event_type,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
            FROM events)
      GROUP BY event_type ORDER BY event_type"""))

  /** Analytic window frame: per-user running total (cents-exact) over
    * the event sequence — the cumulative-frame shape (`ROWS UNBOUNDED
    * PRECEDING`) absent from the reference.
    */
  val qRunningTotal = QueryDef(
    "q_running_total",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Long.MinValue, 0)
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), cents.as("c"))
        .withColumn("running_value", (sum(col("c")).over(w).cast("double") / 100))
        .select(col("user_id"), col("event_id"), col("running_value"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id,
             CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY event_id
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100
               AS running_value
      FROM (SELECT user_id, event_id,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
            FROM events)
      WHERE user_id < 20
      ORDER BY user_id, event_id"""))

  /** lag(): per-user delta between consecutive event values (exact
    * cents; NULL for each user's first event).
    */
  val qLagDelta = QueryDef(
    "q_lag_delta",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), cents.as("c"))
        .withColumn("delta_value",
          ((col("c") - lag(col("c"), 1).over(w)).cast("double") / 100))
        .select(col("user_id"), col("event_id"), col("delta_value"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id,
             CAST(c - lag(c, 1) OVER (PARTITION BY user_id ORDER BY event_id)
                  AS DOUBLE) / 100 AS delta_value
      FROM (SELECT user_id, event_id,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
            FROM events)
      WHERE user_id < 20
      ORDER BY user_id, event_id"""))

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT: per-cohort event-type value matrix with a FIXED value list
    * (never data-driven at scale — that is a collect of the key domain);
    * the oracle is the equivalent conditional aggregation.
    */
  val qPivot = QueryDef(
    "q_pivot",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      t(s, dir, "events")
        .select((col("user_id") % 10).as("cohort"), col("event_type"),
          cents.as("c"))
        .groupBy(col("cohort"))
        .pivot("event_type", eventTypes)
        .agg((sum(col("c")).cast("double") / 100))
        .orderBy(col("cohort"))
    },
    Some(s"""
      SELECT user_id % 10 AS cohort,
             ${eventTypes.map(t =>
               s"CAST(SUM(CASE WHEN event_type = '$t' THEN c END) AS DOUBLE) / 100 AS \"$t\"")
               .mkString(",\n             ")}
      FROM (SELECT user_id, event_type,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
            FROM events)
      GROUP BY user_id % 10
      ORDER BY cohort"""))

  /** Order-to-ship latency SLA: per order priority, the p50/p95/max of
    * days between order placement and line shipment — the fulfillment
    * percentile report a supply chain reads daily. Day lags are exact
    * integers from calendar-date differences; the percentiles ride the
    * same exact-integer `percentile`/`quantile_cont` parity as
    * q_percentiles.
    *
    * Scale: the one join is fact-to-fact but equi-keyed on orderkey —
    * with both tables bucketed by orderkey (engine/Bucketing) it is
    * exchange-free; only (key, priority, two dates) travel. The
    * percentiles use the built-in aggregate DELIBERATELY: day lags are
    * a BOUNDED domain (hundreds of distinct values), so its per-group
    * value→count buffer is bounded and the join is evaluated exactly
    * once — whereas routing through
    * [[graft.engine.GroupedQuantiles.interpolated]] would re-evaluate
    * the fact-to-fact join per histogram pass (measured 0.84→1.32 s).
    * For NEAR-CONTINUOUS measures the tradeoff flips: see
    * q_percentiles, whose value domain scales with the data.
    */
  val qShipLatency = QueryDef(
    "q_ship_latency",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          to_date(col("o_orderdate")).as("od"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          to_date(col("l_shipdate")).as("sd"))
      l.join(o, Seq("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("sd"), col("od")).cast("long").as("lag_days"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          expr("percentile(lag_days, 0.5d)").as("p50_days"),
          expr("percentile(lag_days, 0.95d)").as("p95_days"),
          max(col("lag_days")).as("max_days"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n_lines,
             quantile_cont(lag_days, 0.5) AS p50_days,
             quantile_cont(lag_days, 0.95) AS p95_days,
             max(lag_days) AS max_days
      FROM (SELECT o.o_orderpriority,
                   CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                     CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_days
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  val all: Seq[QueryDef] = Seq(qSimhashPairs, qRollup, qCube, qDateParts,
    qSessionWindows, qStatsVariance, qCollectSorted, qPercentiles,
    qRunningTotal, qLagDelta, qPivot, qShipLatency)
}
