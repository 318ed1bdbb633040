package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.queries.QueryDef.dec

/** Warehouse-lifecycle operators beyond the reference's star build: SCD
  * Type-2 dimension versioning, a declarative data-quality audit,
  * time-range window frames, and a manual bloom-filter runtime filter —
  * the operations a production warehouse team layers on top of the
  * reference's ODS→DDS→DM pipeline (SURVEY §7.6 extension surface).
  */
object WarehouseQueries {

  /** SCD Type 2: version a mutating attribute from a change log. The
    * reference's dims are Type 1 (latest value wins, `ON CONFLICT DO
    * NOTHING`); Type 2 is the standard upgrade — each attribute change
    * opens a new (valid_from, valid_to] version row, the live version has
    * valid_to NULL. Here the change log is the `events` purchase stream
    * per user, collapsed to actual value changes (consecutive duplicates
    * carry no new version) with lag(), then versioned with row_number()
    * and closed with lead().
    *
    * Scale: two window passes over the same (user_id; ts, event_id)
    * ordering — one shuffle total, per-user partitions, no global sort.
    * Monetary values travel as exact integer cents (QueryDef discipline).
    */
  val qScd2 = QueryDef(
    "q_scd2",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      val log = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"),
          cents.as("attr_cents"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val changed = log
        .withColumn("prev", lag(col("attr_cents"), 1).over(w))
        .filter(col("prev").isNull || col("attr_cents") =!= col("prev"))
      changed
        .withColumn("version", row_number().over(w).cast("bigint"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("version"),
          (col("attr_cents").cast("double") / 100).as("attr"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy(col("user_id"), col("version"))
    },
    Some("""
      WITH log AS (
        SELECT user_id, event_id, ts,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS attr_cents
        FROM events WHERE event_type = 'purchase'),
      changed AS (
        SELECT user_id, event_id, ts, attr_cents FROM (
          SELECT *, lag(attr_cents) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM log)
        WHERE prev IS NULL OR attr_cents <> prev)
      SELECT user_id,
             row_number() OVER w AS version,
             CAST(attr_cents AS DOUBLE) / 100 AS attr,
             ts AS valid_from,
             lead(ts) OVER w AS valid_to,
             lead(ts) OVER w IS NULL AS is_current
      FROM changed
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, version"""))

  /** Time-range window frame: per-event rolling 1-hour lookback
    * (count + sum) per user via RANGE BETWEEN on exact epoch
    * microseconds — the window shape q_window_sliding's groupBy-window
    * cannot express (that one buckets; this one is per-row, frame
    * boundaries at value distance, ties = peers in both engines).
    */
  val qWindowRangeFrame = QueryDef(
    "q_window_range_frame",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      val base = t(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), cents.as("cents"))
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      base
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", sum(col("cents")).over(w).cast("double") / 100)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("n_1h"), col("sum_1h"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             count(*) OVER w AS n_1h,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  OVER w AS DOUBLE) / 100 AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, ts_us, event_id"""))

  /** Declarative data-quality audit: the expectation checks a warehouse
    * runs before promoting a load (the reference's analogue is its UNIQUE
    * constraints and FK references, `ddl_ods.sql:23`, `ddl_dds.sql:26-31`
    * — enforced by Postgres, absent on a lake). ONE pass over lineitem
    * computes every check: row-level expectations as conditional sums, a
    * multi-column distinct for duplicate business keys, and referential
    * orphans as a broadcast LEFT join against the pruned single-column
    * orders key whose misses are counted in the same aggregate — no
    * second fact scan, no separate anti-join. The single-row result
    * unpivots into the (check, violations) report. Scale: audit cost is
    * one fact scan + one KB-sized broadcast regardless of how many
    * checks ride along.
    */
  val qDqAudit = QueryDef(
    "q_dq_audit",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val ordKeys = t(s, dir, "orders")
        .select(col("o_orderkey")).distinct()
        .withColumn("__ord_ok", lit(1))
      val viol = (c: org.apache.spark.sql.Column) =>
        sum(when(c, 1L).otherwise(0L))
      // dup counting is scoped to rows whose key is FULLY non-null on
      // both engines: Spark's countDistinct skips any-NULL tuples while
      // DuckDB's count(DISTINCT (a,b)) counts them, so the minuend must
      // count the same non-null-key population (a NULL key is its own
      // violation class, not a duplicate)
      val keyNonNull =
        col("l_orderkey").isNotNull && col("l_linenumber").isNotNull
      val rowChecks = li
        .join(broadcast(ordKeys), li("l_orderkey") === ordKeys("o_orderkey"), "left")
        .agg(
          count(lit(1)).as("total"),
          viol(col("l_quantity") < 1 || col("l_quantity") > 50).as("qty_out_of_range"),
          viol(col("l_extendedprice") <= 0).as("price_not_positive"),
          viol(col("l_discount") < 0 || col("l_discount") > 1).as("discount_out_of_range"),
          (viol(keyNonNull) - countDistinct(col("l_orderkey"), col("l_linenumber")))
            .as("dup_business_key"),
          viol(col("__ord_ok").isNull).as("orphan_orderkey"))
      rowChecks
        .unpivot(Array(col("total")),
          Array(col("dup_business_key"), col("discount_out_of_range"),
            col("orphan_orderkey"), col("price_not_positive"),
            col("qty_out_of_range")),
          "check_name", "violations")
        .select(col("check_name"), col("violations"), col("total"),
          (col("violations") === 0L).as("pass"))
        .orderBy(col("check_name"))
    },
    Some("""
      WITH agg AS (
        SELECT count(*) AS total,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS qty_out_of_range,
               CAST(SUM(CASE WHEN l_extendedprice <= 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS price_not_positive,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS discount_out_of_range,
               -- scoped to fully non-null keys, matching Spark's
               -- countDistinct null-tuple semantics
               CAST(SUM(CASE WHEN l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT)
                 - count(DISTINCT CASE WHEN l_orderkey IS NOT NULL
                                        AND l_linenumber IS NOT NULL
                                       THEN (l_orderkey, l_linenumber) END)
                 AS dup_business_key
        FROM lineitem),
      orph AS (
        SELECT count(*) AS orphan_orderkey FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
      SELECT check_name, violations, total, violations = 0 AS pass FROM (
        SELECT 'dup_business_key' AS check_name, dup_business_key AS violations, total FROM agg
        UNION ALL SELECT 'discount_out_of_range', discount_out_of_range, total FROM agg
        UNION ALL SELECT 'orphan_orderkey', orphan_orderkey, total FROM agg, orph
        UNION ALL SELECT 'price_not_positive', price_not_positive, total FROM agg
        UNION ALL SELECT 'qty_out_of_range', qty_out_of_range, total FROM agg)
      ORDER BY check_name"""))

  /** Manual bloom-filter runtime filter: build a bloom over the dim-side
    * join keys (suppliers of one nation), pre-filter the fact scan with
    * it, then run the real join — the join removes the bloom's false
    * positives, so results are EXACTLY the plain join's (which is the
    * oracle). Spark's own `InjectRuntimeFilter` does this automatically
    * inside one query when thresholds allow; the library-level variant
    * shown here is the tool when the filter must cross stages or jobs
    * (built once, applied to many fact scans), which is where the
    * 100 TB win lives: the bloom ships as a few KB and drops
    * non-matching fact rows before any shuffle.
    *
    * The build and probe are Spark's OWN expressions —
    * `bloom_filter_agg` / `might_contain`, registered for SQL by
    * [[graft.GraftExtensions]] — so the filter aggregates executor-side
    * (partial blooms merged, only the KB sketch crosses the wire as a
    * scalar-subquery result) and the probe is native and codegen'd.
    * No UDF, no driver-side key list; an empty dim yields a NULL bloom,
    * `might_contain` returns NULL, and the WHERE drops every row —
    * exactly the empty join result.
    */
  val qBloomPrune = QueryDef(
    "q_bloom_prune",
    (s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("graft_bp_supplier")
      t(s, dir, "nation").createOrReplaceTempView("graft_bp_nation")
      t(s, dir, "lineitem").createOrReplaceTempView("graft_bp_lineitem")
      s.sql("""
        WITH sup AS (
          SELECT s_suppkey, s_name
          FROM graft_bp_supplier
          JOIN graft_bp_nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'),
        bloom AS (
          SELECT bloom_filter_agg(xxhash64(s_suppkey), 65536L) AS bf
          FROM sup)
        SELECT /*+ BROADCAST(sup) */ s_suppkey, s_name,
               count(*) AS n_items,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    CAST(1 - CAST(l_discount AS DECIMAL(18,2))
                         AS DECIMAL(4,2))
                    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM graft_bp_lineitem
        JOIN sup ON l_suppkey = s_suppkey
        WHERE might_contain((SELECT bf FROM bloom), xxhash64(l_suppkey))
        GROUP BY s_suppkey, s_name
        ORDER BY s_suppkey""")
    },
    Some("""
      SELECT s_suppkey, s_name, count(*) AS n_items,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
                  AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY s_suppkey, s_name
      ORDER BY s_suppkey"""))

  /** Batch twin of [[graft.streaming.BurstDetector]] — per-user peak
    * 1-hour event rate with a threshold gate, built on the same
    * range-frame window as q_window_range_frame. Like
    * q_click_attribution for the stream-stream join, this registration
    * hash-checks the burst SEMANTICS against the oracle; the streaming
    * form adds only state/eviction mechanics (StreamingSpec).
    */
  val qBurstEvents = QueryDef(
    "q_burst_events",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("n_1h")).as("peak_1h"))
        .filter(col("peak_1h") >= 5)
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, max(n_1h) AS peak_1h FROM (
        SELECT user_id,
               count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h
        FROM events)
      GROUP BY user_id HAVING max(n_1h) >= 5
      ORDER BY user_id"""))

  /** Incremental view maintenance by the counting algorithm: a daily
    * (event_type, day) mart is kept current under a delta batch holding
    * both INSERTS (mult = +1) and RETRACTIONS (mult = −1) — the delta
    * shape a CDC feed or a late-data correction emits. The old
    * aggregate state is folded in as (key, n, cents) rows, the delta as
    * (key, ±1, ±cents); one hash aggregate merges them and rows whose
    * support count drops to zero disappear — the view never touches the
    * base fact again. q_rollup_merge is the insert-only cousin; this is
    * the general form with deletes.
    *
    * Scale: cost is |state| + |delta|, never |fact| — the point of IVM
    * at 100 TB. The merge is one shuffle keyed by the mart key, and the
    * state side arrives pre-aggregated (one row per key).
    *
    * The synthetic split: base = events with event_id % 10 ≠ 0 (the
    * already-loaded fact), inserts = the % 10 = 0 remainder, retractions
    * = base rows with event_id % 7 = 0 (a correction recalling them).
    */
  val qIvmCounting = QueryDef(
    "q_ivm_counting",
    (s, dir) => {
      val ev = t(s, dir, "events").select(
        col("event_id"), col("event_type"), to_date(col("ts")).as("day"),
        (dec(col("value")) * 100).cast("bigint").as("cents"))
      val base = ev.filter(pmod(col("event_id"), lit(10L)) =!= 0)
      val state = base.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      val inserts = ev.filter(pmod(col("event_id"), lit(10L)) === 0)
        .select(col("event_type"), col("day"),
          lit(1L).as("n"), col("cents"))
      val retractions = base.filter(pmod(col("event_id"), lit(7L)) === 0)
        .select(col("event_type"), col("day"),
          lit(-1L).as("n"), (-col("cents")).as("cents"))
      state.select(col("event_type"), col("day"), col("n"), col("cents"))
        .unionAll(inserts).unionAll(retractions)
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("n")).as("n_events"),
          (sum(col("cents")).cast("double") / 100).as("sum_value"))
        .filter(col("n_events") > 0)
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, event_type, CAST(ts AS DATE) AS day,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events),
      state AS (
        SELECT event_type, day, count(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM ev WHERE event_id % 10 <> 0 GROUP BY 1, 2),
      delta AS (
        SELECT event_type, day, CAST(1 AS BIGINT) AS n, cents
        FROM ev WHERE event_id % 10 = 0
        UNION ALL
        SELECT event_type, day, CAST(-1 AS BIGINT) AS n, -cents
        FROM ev WHERE event_id % 10 <> 0 AND event_id % 7 = 0)
      SELECT event_type, day,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(SUM(cents) AS DOUBLE) / 100 AS sum_value
      FROM (SELECT * FROM state UNION ALL SELECT * FROM delta)
      GROUP BY 1, 2 HAVING SUM(n) > 0
      ORDER BY event_type, day"""))

  /** The Morton (Z-order) clustering code itself, hash-checked: the
    * interleave of the low 16 bits of (l_partkey, l_suppkey) — the sort
    * key [[graft.engine.ZOrder.clusteredWrite]] lays files out by. Both
    * engines evaluate the SAME generated shift/mask expression
    * ([[graft.engine.ZOrder.zValueSql]] is built from the identical
    * loop), so the oracle pins the bit math; the file-skipping effect of
    * the layout is asserted in ZOrderSpec (clustered scan reads a
    * fraction of the rows a linearly-sorted layout does for a 2-D box).
    */
  val qZorderCluster = QueryDef(
    "q_zorder_cluster",
    (s, dir) => t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        graft.engine.ZOrder.zValue(
          col("l_partkey").cast("long"), col("l_suppkey").cast("long"))
          .as("zval"))
      .orderBy(col("zval"), col("l_orderkey"), col("l_partkey"))
      .limit(50),
    Some(s"""
      SELECT l_orderkey, l_partkey, l_suppkey,
             ${graft.engine.ZOrder.zValueSql("l_partkey", "l_suppkey")} AS zval
      FROM lineitem
      ORDER BY zval, l_orderkey, l_partkey LIMIT 50"""))

  /** CDC snapshot diff: derive an insert/update/delete changelog from
    * two full table snapshots — the change-capture primitive for
    * warehouses whose upstream can only hand over complete extracts
    * (the reference's daily full-feed pattern). The two snapshots are
    * simulated deterministically from `orders` (keys ≡7 mod 10 are new
    * in B, ≡3 deleted, ≡5 repriced); the diff itself is the operator:
    * full outer join on the key, rows classified by null-side and
    * value inequality, unchanged rows dropped. Money travels as exact
    * integer cents (QueryDef discipline).
    *
    * Scale: one key-shuffle (sort-merge full outer) over key+compared
    * columns only — the payload never moves. With both snapshots
    * bucketed by key (engine/Bucketing) the diff is zero-shuffle; the
    * changelog then feeds `Upsert.mergePartitioned` instead of a full
    * rewrite.
    */
  val qSnapshotDiff = QueryDef(
    "q_snapshot_diff",
    (s, dir) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), cents.as("cents"))
      val snapA = base.filter(col("o_orderkey") % 10 =!= 7)
        .select(col("o_orderkey"), col("cents").as("old_cents"))
      val snapB = base.filter(col("o_orderkey") % 10 =!= 3)
        .select(col("o_orderkey"),
          (col("cents") + when(col("o_orderkey") % 10 === 5, 100L)
            .otherwise(0L)).as("new_cents"))
      snapA.join(snapB, Seq("o_orderkey"), "full_outer")
        .withColumn("change_type",
          when(col("old_cents").isNull, "insert")
            .when(col("new_cents").isNull, "delete")
            .when(col("old_cents") =!= col("new_cents"), "update"))
        .filter(col("change_type").isNotNull)
        .select(col("o_orderkey"), col("change_type"),
          col("old_cents"), col("new_cents"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM orders),
      sa AS (SELECT o_orderkey, cents AS old_cents FROM base
             WHERE o_orderkey % 10 <> 7),
      sb AS (SELECT o_orderkey,
                    cents + CASE WHEN o_orderkey % 10 = 5 THEN 100 ELSE 0 END
                      AS new_cents
             FROM base WHERE o_orderkey % 10 <> 3)
      SELECT o_orderkey,
             CASE WHEN old_cents IS NULL THEN 'insert'
                  WHEN new_cents IS NULL THEN 'delete'
                  ELSE 'update' END AS change_type,
             old_cents, new_cents
      FROM sa FULL OUTER JOIN sb USING (o_orderkey)
      WHERE old_cents IS NULL OR new_cents IS NULL
         OR old_cents <> new_cents
      ORDER BY o_orderkey"""))

  /** Feed-completeness audit: for every expected reporter (user) and
    * every observed day, detect the missing check-ins — the operational
    * twin of the reference's daily-drop contract ("did each country's
    * file land today?"), generalized to any (reporter, period) grid.
    * Reported as per-reporter missing-day counts with the first hole;
    * fully-present reporters produce no row (the report is the
    * exceptions, not the grid).
    *
    * Scale: the expected grid is a cross of two BOUNDED dimensions
    * (reporters × recent days) — broadcast nested-loop by construction,
    * never fact-sized — and the anti-join keys on the same (reporter,
    * day) pair the distinct aggregate just produced. The fact stream
    * collapses to that distinct relation first.
    */
  val qFeedGaps = QueryDef(
    "q_feed_gaps",
    (s, dir) => {
      val seen = t(s, dir, "events")
        .filter(col("user_id") < 30)
        .select(col("user_id"),
          call_function("div", unix_micros(col("ts")), lit(86400000000L))
            .as("day_id"))
        .distinct()
      val users = seen.select(col("user_id")).distinct()
      val days = seen.select(col("day_id")).distinct()
      users.crossJoin(broadcast(days))
        .join(seen, Seq("user_id", "day_id"), "left_anti")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_missing_days"),
          min(col("day_id")).as("first_missing_day"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH d AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_id
        FROM events WHERE user_id < 30),
      u AS (SELECT DISTINCT user_id FROM d),
      dy AS (SELECT DISTINCT day_id FROM d),
      gaps AS (
        SELECT u.user_id, dy.day_id FROM u, dy
        EXCEPT SELECT user_id, day_id FROM d)
      SELECT user_id, count(*) AS n_missing_days,
             min(day_id) AS first_missing_day
      FROM gaps GROUP BY user_id ORDER BY user_id"""))

  /** One time-travel fixture table per (session, sfDir): a month-
    * partitioned slice of `orders` (keys ≡ 0 mod 7, prices as exact
    * cents) upserted as version 1, then an SCD1 merge bumping every
    * ≡ 0 mod 14 key's price by one cent as version 2 — two committed
    * manifest snapshots with deterministic, oracle-computable content.
    */
  private val ttOnce = new graft.engine.SessionKeyedCache[String]

  private def ttTable(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ttOnce.getOrElseUpdate(s, s"tt:$dir",
      graft.engine.SessionKeyedCache.fileFingerprint(
        s, s"$dir/orders.parquet"))({
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_tt_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = t(s, dir, "orders")
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("bigint").as("price_cents"),
          date_trunc("month", col("o_orderdate")).cast("date").as("d"))
      graft.engine.Upsert.upsertPartitioned(s, path, base,
        Seq("o_orderkey", "d"), "d")
      val bumped = base.filter(col("o_orderkey") % 14 === 0)
        .withColumn("price_cents", col("price_cents") + 1)
      graft.engine.Upsert.mergePartitioned(s, path, bumped,
        Seq("o_orderkey", "d"), "d")
      path
    })

  /** TIME TRAVEL through the manifest (round 11): the same table read
    * at version 1 (pre-merge) and at the current version (post-merge)
    * in one query — `Manifest.readAsOf` resolving a retired snapshot
    * whose files the merge never touched. The oracle computes both
    * versions' exact row counts and cent sums straight from `orders`,
    * so a green diff proves (a) the v1 snapshot is bit-stable under a
    * later multi-partition merge and (b) the merge's SCD1 semantics
    * landed exactly once — the reader-side counterpart of
    * ManifestSpec's racing-reader proof, held to the same hash gate as
    * every other operator.
    */
  val qTimeTravel = QueryDef(
    "q_time_travel",
    (s, dir) => {
      val path = ttTable(s, dir)
      val versions = graft.engine.Manifest.versions(s, path)
      require(versions.size == 2,
        s"time-travel fixture expected 2 committed versions, got $versions")
      def summarize(df: org.apache.spark.sql.DataFrame, v: Int) =
        df.agg(count(lit(1)).as("n_rows"),
            sum(col("price_cents")).cast("long").as("sum_cents"))
          .select(lit(v).as("version"), col("n_rows"), col("sum_cents"))
      summarize(graft.engine.Manifest.readAsOf(s, path, versions.head), 1)
        .unionByName(summarize(graft.engine.Manifest.read(s, path), 2))
        .orderBy(col("version"))
    },
    Some("""
      WITH s AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc
        FROM orders WHERE o_orderkey % 7 = 0)
      SELECT 1 AS version, count(*) AS n_rows,
             CAST(SUM(pc) AS BIGINT) AS sum_cents FROM s
      UNION ALL
      SELECT 2, count(*),
             CAST(SUM(pc + CASE WHEN o_orderkey % 14 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) FROM s
      ORDER BY version"""))

  /** One stats-skipping fixture table per (session, sfDir): `lineitem`
    * keys + exact-cent price, Z-order clustered on (l_partkey,
    * l_suppkey) into 16 files, committed as a manifest snapshot whose
    * `.stats` sidecar carries the per-file footer envelopes of both
    * cluster columns ([[graft.engine.FileStats.collect]] — footer reads
    * only, distributed).
    */
  private val skOnce = new graft.engine.SessionKeyedCache[String]

  private def skTable(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    skOnce.getOrElseUpdate(s, s"sk:$dir",
      graft.engine.SessionKeyedCache.fileFingerprint(
        s, s"$dir/lineitem.parquet"))({
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_sk_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val base = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * 100).cast("bigint").as("price_cents"))
      graft.engine.ZOrder.clusteredWrite(
        base, "l_partkey", "l_suppkey", 16, path)
      graft.engine.WriterLease.withLease(s, path) {
        val files = graft.engine.Manifest.listDataFiles(s, path)
        val stats = graft.engine.FileStats.collect(
          s, path, files, Seq("l_partkey", "l_suppkey"))
        graft.engine.Manifest.commit(s, path, files, stats)
      }
      path
    })

  /** FILE-LEVEL DATA SKIPPING through manifest stats (round 11): the
    * same 2-D box aggregate computed twice — once over
    * [[graft.engine.Manifest.readSkipping]] (plan-time pruning to the
    * files whose (l_partkey, l_suppkey) envelopes intersect the box)
    * and once over the full snapshot scan. Both rows are hash-checked
    * against the oracle's from-raw-lineitem aggregate, so a green diff
    * proves the pruned schedule loses no qualifying row — the superset
    * guarantee, held to the same gate as every operator. The pruning
    * EFFECT (kept files ≪ total, exact footer envelopes, conservative
    * fallback for stat-less columns) is asserted in FileStatsSpec,
    * following the q_zorder_cluster split of correctness-via-oracle /
    * layout-via-spec.
    *
    * Scale: this is the plan-time half of the Z-order story — at 100 TB
    * the win is scheduling tasks for the handful of overlapping files
    * instead of opening every footer; stats collection itself reads
    * footers only, distributed, O(files) not O(data).
    */
  val qStatsSkipping = QueryDef(
    "q_stats_skipping",
    (s, dir) => {
      val path = skTable(s, dir)
      val box = col("l_partkey").between(1, 150) &&
        col("l_suppkey").between(1, 8)
      val ranges = Seq(("l_partkey", 1.0, 150.0), ("l_suppkey", 1.0, 8.0))
      def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.filter(box)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("price_cents")).cast("long").as("sum_cents"))
          .select(lit(tag).as("scan"), col("n_rows"), col("sum_cents"))
      agg(graft.engine.Manifest.readSkipping(s, path, ranges), "pruned")
        .unionByName(agg(graft.engine.Manifest.read(s, path), "full"))
        .orderBy(col("scan"))
    },
    Some("""
      WITH box AS (
        SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS pc
        FROM lineitem
        WHERE l_partkey BETWEEN 1 AND 150 AND l_suppkey BETWEEN 1 AND 8)
      SELECT 'full' AS scan, count(*) AS n_rows,
             CAST(SUM(pc) AS BIGINT) AS sum_cents FROM box
      UNION ALL
      SELECT 'pruned', count(*), CAST(SUM(pc) AS BIGINT) FROM box
      ORDER BY scan"""))

  /** One schema-evolution fixture table per (session, sfDir): an
    * `orders` slice (keys ≡ 0 mod 11) upserted under the original
    * (key, cents, month) shape, widened by a metadata-only
    * [[graft.engine.Manifest.addColumn]] migration, then a second slice
    * (keys ≡ 5 mod 11) upserted WITH the new `discount_cents` column —
    * three committed versions whose content the oracle computes from
    * `orders` arithmetic.
    */
  private val seOnce = new graft.engine.SessionKeyedCache[String]

  private def seTable(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    seOnce.getOrElseUpdate(s, s"se:$dir",
      graft.engine.SessionKeyedCache.fileFingerprint(
        s, s"$dir/orders.parquet"))({
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_se_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      def slice(rem: Int) = t(s, dir, "orders")
        .filter(col("o_orderkey") % 11 === rem)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("bigint").as("price_cents"),
          date_trunc("month", col("o_orderdate")).cast("date").as("d"))
      graft.engine.Upsert.upsertPartitioned(s, path, slice(0),
        Seq("o_orderkey", "d"), "d")
      graft.engine.Manifest.addColumn(s, path,
        org.apache.spark.sql.types.StructField("discount_cents",
          org.apache.spark.sql.types.LongType, nullable = true))
      // bounded product: key % 1000 < 1000 — no overflow concern
      graft.engine.Upsert.upsertPartitioned(s, path,
        slice(5).withColumn("discount_cents",
          (col("o_orderkey") % 1000).cast("bigint")),
        Seq("o_orderkey", "d"), "d")
      // round 15: metadata-only RENAME — files from the two appends
      // above keep the data under `discount_cents`; readers coalesce
      // the prior-name chain. A THIRD append then lands under the new
      // name, so the table mixes three file generations
      graft.engine.Manifest.renameColumn(s, path,
        "discount_cents", "rebate_cents")
      graft.engine.Upsert.upsertPartitioned(s, path,
        slice(7).withColumn("rebate_cents",
          (col("o_orderkey") % 500).cast("bigint")),
        Seq("o_orderkey", "d"), "d")
      // and a metadata-only ADD → DROP round trip: the dropped column
      // must vanish from the current shape (time travel still sees it)
      graft.engine.Manifest.addColumn(s, path,
        org.apache.spark.sql.types.StructField("tmp_flag",
          org.apache.spark.sql.types.LongType, nullable = true))
      graft.engine.Manifest.dropColumn(s, path, "tmp_flag")
      path
    })

  /** SCHEMA EVOLUTION under the oracle gate (round 11): the evolved
    * table read at the current version (pre-migration rows surface the
    * added column as NULL — count/sum aggregate over the mixed file
    * generations) and time-traveled to the pre-migration version (old
    * shape, no column). A green diff proves the metadata-only migration
    * preserved every original row bit-exactly AND the null backfill is
    * sound: `n_discount` counts exactly the post-migration slice, and
    * `sum_cents` spans both file generations under one pinned schema.
    * The structural facts (unchanged file list, drift gate now
    * enforcing the evolved schema, sidecar retirement) are
    * SchemaEvolutionSpec's half of the split.
    *
    * Scale: the migration cost is ONE manifest commit — adding a column
    * to a 100 TB table rewrites nothing; readers pay zero until a merge
    * actually writes the column.
    */
  val qSchemaEvolution = QueryDef(
    "q_schema_evolution",
    (s, dir) => {
      val path = seTable(s, dir)
      val v1 = graft.engine.Manifest.versions(s, path).head
      val old = graft.engine.Manifest.readAsOf(s, path, v1)
      require(!old.columns.contains("discount_cents"),
        s"schema-evolution fixture: v$v1 must predate the migration")
      val cur = graft.engine.Manifest.read(s, path)
      require(!cur.columns.contains("discount_cents") &&
        !cur.columns.contains("tmp_flag"),
        "schema-evolution fixture: the rename and the drop must both " +
          s"show in the current shape, got ${cur.columns.mkString(",")}")
      cur.agg(count(lit(1)).as("n_rows"),
          sum(col("price_cents")).cast("long").as("sum_cents"),
          count(col("rebate_cents")).as("n_rebate"),
          coalesce(sum(col("rebate_cents")), lit(0L)).cast("long")
            .as("sum_rebate"))
        .select(lit("current").as("snap"), col("n_rows"), col("sum_cents"),
          col("n_rebate"), col("sum_rebate"))
        .unionByName(old
          .agg(count(lit(1)).as("n_rows"),
            sum(col("price_cents")).cast("long").as("sum_cents"))
          .select(lit("v1").as("snap"), col("n_rows"), col("sum_cents"),
            lit(0L).as("n_rebate"), lit(0L).as("sum_rebate")))
        .orderBy(col("snap"))
    },
    Some("""
      WITH b AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc
        FROM orders),
      cur AS (
        SELECT pc, CAST(NULL AS BIGINT) AS dc FROM b WHERE o_orderkey % 11 = 0
        UNION ALL
        SELECT pc, CAST(o_orderkey % 1000 AS BIGINT) FROM b
        WHERE o_orderkey % 11 = 5
        UNION ALL
        SELECT pc, CAST(o_orderkey % 500 AS BIGINT) FROM b
        WHERE o_orderkey % 11 = 7)
      SELECT 'current' AS snap, count(*) AS n_rows,
             CAST(SUM(pc) AS BIGINT) AS sum_cents,
             count(dc) AS n_rebate,
             CAST(COALESCE(SUM(dc), 0) AS BIGINT) AS sum_rebate
      FROM cur
      UNION ALL
      SELECT 'v1', count(*), CAST(SUM(pc) AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM b WHERE o_orderkey % 11 = 0
      ORDER BY snap"""))

  /** One incremental-mart fixture per (session, sfDir): a month-
    * partitioned `orders` slice (keys ≡ 0 mod 7) committed as source
    * v1, a FULL mart refresh (per-month count + exact-cent sum), then
    * an SCD1 merge bumping every ≡ 0 mod 14 key's price by one cent and
    * an INCREMENTAL refresh that recomputes only the months the merge's
    * manifest diff names. Returns (srcPath, martPath,
    * recomputedPartitions).
    */
  private val imOnce =
    new graft.engine.SessionKeyedCache[(String, String, Seq[String])]

  /** The im fixture's mart computation — shared verbatim by the
    * incremental refresh, the MV registration, and q_mv_rewrite's
    * defining query (the rewrite matches PLAN SHAPE, so all three must
    * be the same function, not lookalike code).
    */
  private def imMartCompute(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("d"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price_cents")).cast("long").as("sum_cents"))

  private def imTable(s: org.apache.spark.sql.SparkSession,
      dir: String): (String, String, Seq[String]) =
    imOnce.getOrElseUpdate(s, s"im:$dir",
      graft.engine.SessionKeyedCache.fileFingerprint(
        s, s"$dir/orders.parquet"))({
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_im_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val srcPath = s"${base}_src"
      val martPath = s"${base}_mart"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(srcPath, martPath).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      // one file per month partition: without the repartition every
      // partition gets up to spark.sql.shuffle.partitions files and the
      // fixture becomes a thousands-of-tiny-files table whose listings
      // and footer reads dominate every later plan build
      val src = t(s, dir, "orders")
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("bigint").as("price_cents"),
          date_trunc("month", col("o_orderdate")).cast("date").as("d"))
        .repartition(col("d"))
      graft.engine.Upsert.upsertPartitioned(s, srcPath, src,
        Seq("o_orderkey", "d"), "d")
      graft.engine.Incremental.refresh(s, srcPath, martPath, "d")(
        imMartCompute)
      val bumped = src.filter(col("o_orderkey") % 14 === 0)
        .withColumn("price_cents", col("price_cents") + 1)
        .repartition(col("d"))
      graft.engine.Upsert.mergePartitioned(s, srcPath, bumped,
        Seq("o_orderkey", "d"), "d")
      val r = graft.engine.Incremental.refresh(s, srcPath, martPath, "d")(
        imMartCompute)
      require(r.recomputed.nonEmpty && r.recomputed != Seq("<full>"),
        s"incremental fixture expected a partial refresh, got $r")
      (srcPath, martPath, r.recomputed)
    })

  /** INCREMENTAL MART MAINTENANCE from manifest diffs (round 11): the
    * mart below was never fully recomputed after the source merge —
    * `Incremental.refresh` diffed two source manifest versions (pure
    * driver arithmetic, no data I/O), named the changed month
    * partitions, recomputed ONLY those slices and swapped them in
    * wholesale ([[graft.engine.Upsert.overwritePartitions]]). The
    * oracle computes the post-merge mart from `orders` directly, so a
    * green hash proves the incremental path converged to exactly the
    * from-scratch answer — missed partitions, stale groups, or leaked
    * rows would all surface as a diff. The machinery facts (exact
    * changed-partition set, untouched partitions bit-identical,
    * vanished groups dropped, no-op idempotence, leak guard) are
    * IncrementalSpec's half.
    *
    * Scale: a daily merge touches one date partition of ~3650; the
    * refresh cost is O(touched day), not O(history) — the difference
    * between a mart rebuild that scans 100 TB and one that scans 30 GB.
    */
  val qIncrementalMart = QueryDef(
    "q_incremental_mart",
    (s, dir) => {
      val (_, martPath, _) = imTable(s, dir)
      graft.engine.Manifest.read(s, martPath)
        .select(col("d"), col("n_orders"), col("sum_cents"))
        .orderBy(col("d"))
    },
    Some("""
      WITH s AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS d,
               CAST(floor(o_totalprice * 100) AS BIGINT)
                 + CASE WHEN o_orderkey % 14 = 0 THEN 1 ELSE 0 END AS pc
        FROM orders WHERE o_orderkey % 7 = 0)
      SELECT d, count(*) AS n_orders, CAST(SUM(pc) AS BIGINT) AS sum_cents
      FROM s GROUP BY d ORDER BY d"""))

  /** One CDC fixture per (session, sfDir): a month-partitioned `orders`
    * slice (keys ≡ 0 mod 7) committed as the FROM snapshot, then ONE
    * dynamic partition overwrite of the 1996 months that deletes ≡ 0
    * mod 21 keys, bumps ≡ 0 mod 14 keys by a cent, and inserts ≡ 0
    * mod 3 (∧ ≢ 0 mod 7) keys — all three change types in one commit,
    * scoped to 12 of ~80 partitions so the feed's O(delta) read is
    * real, not vacuous. `expectedValues` = every live 1996 month, so a
    * month whose recomputed slice is empty is dropped (its rows must
    * surface as deletes) rather than silently untouched.
    * Returns (srcPath, vFrom, vTo).
    */
  private val cdcOnce =
    new graft.engine.SessionKeyedCache[(String, Long, Long)]

  private def cdcTable(s: org.apache.spark.sql.SparkSession,
      dir: String): (String, Long, Long) =
    cdcOnce.getOrElseUpdate(s, s"cdc:$dir",
      graft.engine.SessionKeyedCache.fileFingerprint(
        s, s"$dir/orders.parquet"))({
      val srcPath = s"${System.getProperty("java.io.tmpdir")}/graft_cdc_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}_src"
      val fs = new org.apache.hadoop.fs.Path(srcPath)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(srcPath), true)
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("bigint").as("price_cents"),
          date_trunc("month", col("o_orderdate")).cast("date").as("d"))
      graft.engine.Upsert.upsertPartitioned(s, srcPath,
        base.filter(col("o_orderkey") % 7 === 0).repartition(col("d")),
        Seq("o_orderkey", "d"), "d")
      val vFrom = graft.engine.Manifest.currentVersion(s, srcPath).get
      val in96 = year(col("d")) === 1996
      val incoming = base
        .filter(in96 && col("o_orderkey") % 7 === 0 &&
          col("o_orderkey") % 21 =!= 0)
        .withColumn("price_cents",
          when(col("o_orderkey") % 14 === 0, col("price_cents") + 1)
            .otherwise(col("price_cents")))
        .unionByName(base.filter(in96 && col("o_orderkey") % 3 === 0 &&
          col("o_orderkey") % 7 =!= 0))
        .repartition(col("d"))
      // expected = EVERY 1996 month present in orders, not just months
      // live in v1: on sparse data the insert branch can introduce a
      // month with no v1 rows, and a v1-only month with an empty
      // recomputed slice must be DROPPED (its rows become deletes);
      // expected-but-absent months are a no-op by construction
      val live96 = base.filter(in96).select(col("d")).distinct()
        .collect().map(_.getDate(0).toString).sorted.toSeq
      graft.engine.Upsert.overwritePartitions(s, srcPath, incoming, "d",
        expectedValues = Some(live96))
      val vTo = graft.engine.Manifest.currentVersion(s, srcPath).get
      (srcPath, vFrom, vTo)
    })

  /** ROW-LEVEL CDC FEED from manifest file diffs (round 11,
    * [[graft.engine.ChangeFeed]]): the net insert/update/delete rows
    * between two committed snapshots, reconstructed on demand — no
    * change log is written. Files common to both versions are never
    * read (immutability makes them changeless by construction), so the
    * feed's I/O is O(changed files): here 12 month partitions of ~80,
    * CdcSpec proves the scan-file set. The oracle recomputes all three
    * change classes from `orders` arithmetic, so a green hash proves
    * classification, the value-identical-rewrite filter (≡ 0 mod 7
    * non-multiples-of-14 rows in touched partitions are rewritten
    * byte-identical and must NOT appear), and both update images.
    */
  val qCdcFeed = QueryDef(
    "q_cdc_feed",
    (s, dir) => {
      val (srcPath, vFrom, vTo) = cdcTable(s, dir)
      graft.engine.ChangeFeed.changes(s, srcPath, vFrom, vTo,
        Seq("o_orderkey"))
        .select(col("o_orderkey"), col("price_cents"), col("d"),
          col(graft.engine.ChangeFeed.ChangeCol).as("change_type"))
        .orderBy(col("o_orderkey"), col("change_type"))
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS d
        FROM orders),
      v1 AS (SELECT k, pc, d FROM base
             WHERE k % 7 = 0 AND EXTRACT(year FROM d) = 1996),
      v2 AS (SELECT k, pc + CASE WHEN k % 14 = 0 THEN 1 ELSE 0 END AS pc, d
             FROM base
             WHERE k % 7 = 0 AND k % 21 <> 0 AND EXTRACT(year FROM d) = 1996
             UNION ALL
             SELECT k, pc, d FROM base
             WHERE k % 3 = 0 AND k % 7 <> 0 AND EXTRACT(year FROM d) = 1996),
      upd AS (SELECT v1.k FROM v1 JOIN v2 ON v1.k = v2.k
              WHERE v1.pc <> v2.pc)
      SELECT k AS o_orderkey, pc AS price_cents, d, change_type FROM (
        SELECT k, pc, d, 'insert' AS change_type FROM v2
        WHERE k NOT IN (SELECT k FROM v1)
        UNION ALL
        SELECT k, pc, d, 'delete' FROM v1
        WHERE k NOT IN (SELECT k FROM v2)
        UNION ALL
        SELECT v1.k, v1.pc, v1.d, 'update_preimage'
        FROM v1 JOIN upd ON v1.k = upd.k
        UNION ALL
        SELECT v2.k, v2.pc, v2.d, 'update_postimage'
        FROM v2 JOIN upd ON v2.k = upd.k)
      ORDER BY o_orderkey, change_type"""))

  /** The change feed through the SQL surface: `table_changes(path,
    * vFrom, vTo, keys)` ([[graft.plans.TableChangesTvf]]) on the same
    * fixture and against the same from-scratch oracle as q_cdc_feed —
    * the TVF expansion and the DataFrame API mutually pin each other,
    * and a SQL-only consumer provably gets the identical feed.
    */
  val qSqlCdcFeed = QueryDef(
    "q_sql_cdc_feed",
    (s, dir) => {
      val (srcPath, vFrom, vTo) = cdcTable(s, dir)
      s.sql(
        s"""SELECT o_orderkey, price_cents, d,
                   ${graft.engine.ChangeFeed.ChangeCol} AS change_type
            FROM table_changes('$srcPath', $vFrom, $vTo, 'o_orderkey')
            ORDER BY o_orderkey, change_type""")
    },
    qCdcFeed.oracle)

  /** AUTOMATIC MV REWRITE ([[graft.engine.MaterializedViews]]): this
    * query is written against the SOURCE — it re-states the mart's
    * defining aggregation over the month-partitioned orders slice —
    * and the engine answers it from the incrementally-maintained mart
    * (plan-shape match + freshness gate; MaterializedViewSpec proves
    * the scan actually lands on the mart and that a stale mart falls
    * back to the honest source scan). The oracle recomputes from
    * `orders` arithmetic, so a green hash proves the rewrite is
    * SEMANTICS-PRESERVING — with q_incremental_mart (direct mart read)
    * and the from-scratch oracle this pins all three formulations to
    * one answer. At 100 TB: the analyst's fact-scan aggregation
    * becomes a read of an ~KB mart, automatically and only when fresh.
    */
  val qMvRewrite = QueryDef(
    "q_mv_rewrite",
    (s, dir) => {
      val (srcPath, martPath, _) = imTable(s, dir)
      graft.engine.MaterializedViews.register(
        s, s"im:$dir", srcPath, martPath)(imMartCompute)
      imMartCompute(graft.engine.Manifest.read(s, srcPath))
        .select(col("d"), col("n_orders"), col("sum_cents"))
        .orderBy(col("d"))
    },
    qIncrementalMart.oracle)

  private val delOnce = new graft.engine.SessionKeyedCache[String]

  /** ROW-LEVEL DELETE ([[graft.engine.Upsert.deleteWhere]], round 11):
    * a month-partitioned orders slice (keys ≡ 0 mod 3) with every
    * ≡ 0 mod 15 key DELETED through the manifest path — files without
    * a matching row are not rewritten (DeleteSpec pins the file names),
    * prior snapshots retain the rows, and the change feed reports the
    * deletions. The oracle recomputes the survivor set from `orders`
    * arithmetic, so a green hash proves the delete removed exactly the
    * matching rows and nothing else. At 100 TB a targeted delete
    * rewrites O(files containing matches), not the table.
    */
  val qDeleteWhere = QueryDef(
    "q_delete_where",
    (s, dir) => {
      val tbl = delOnce.getOrElseUpdate(s, s"del:$dir",
        graft.engine.SessionKeyedCache.fileFingerprint(
          s, s"$dir/orders.parquet"))({
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_del_" +
          s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
        val fs = new org.apache.hadoop.fs.Path(p)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(p), true)
        graft.engine.Upsert.upsertPartitioned(s, p,
          t(s, dir, "orders")
            .filter(col("o_orderkey") % 3 === 0)
            .select(col("o_orderkey"),
              floor(col("o_totalprice") * 100).cast("bigint")
                .as("price_cents"),
              date_trunc("month", col("o_orderdate")).cast("date").as("d"))
            .repartition(col("d")),
          Seq("o_orderkey", "d"), "d")
        graft.engine.Upsert.deleteWhere(s, p, col("o_orderkey") % 15 === 0)
        p
      })
      graft.engine.Manifest.read(s, tbl)
        .select(col("o_orderkey"), col("price_cents"), col("d"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS d
      FROM orders
      WHERE o_orderkey % 3 = 0 AND o_orderkey % 15 <> 0
      ORDER BY o_orderkey"""))

  private val updOnce = new graft.engine.SessionKeyedCache[String]

  /** ROW-LEVEL UPDATE ([[graft.engine.Upsert.updateWhere]], round 11):
    * deleteWhere's sibling — a month-partitioned orders slice (keys
    * ≡ 0 mod 4) with every ≡ 0 mod 8 key's price bumped 7 cents
    * through the touched-files-only rewrite. The oracle recomputes the
    * post-update table from `orders` arithmetic: a green hash proves
    * matches were updated in place, non-matches carried byte-equal,
    * and nothing was lost or duplicated across the file swap.
    */
  val qUpdateWhere = QueryDef(
    "q_update_where",
    (s, dir) => {
      val tbl = updOnce.getOrElseUpdate(s, s"upd:$dir",
        graft.engine.SessionKeyedCache.fileFingerprint(
          s, s"$dir/orders.parquet"))({
        val p = s"${System.getProperty("java.io.tmpdir")}/graft_upd_" +
          s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
        val fs = new org.apache.hadoop.fs.Path(p)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(p), true)
        graft.engine.Upsert.upsertPartitioned(s, p,
          t(s, dir, "orders")
            .filter(col("o_orderkey") % 4 === 0)
            .select(col("o_orderkey"),
              floor(col("o_totalprice") * 100).cast("bigint")
                .as("price_cents"),
              date_trunc("month", col("o_orderdate")).cast("date").as("d"))
            .repartition(col("d")),
          Seq("o_orderkey", "d"), "d")
        graft.engine.Upsert.updateWhere(s, p,
          col("o_orderkey") % 8 === 0,
          Map("price_cents" -> (col("price_cents") + 7L)))
        p
      })
      graft.engine.Manifest.read(s, tbl)
        .select(col("o_orderkey"), col("price_cents"), col("d"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 8 = 0 THEN 7 ELSE 0 END
               AS price_cents,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS d
      FROM orders
      WHERE o_orderkey % 4 = 0
      ORDER BY o_orderkey"""))

  /** One maintained-mart fixture per (session, sfDir): a partitioned
    * source built from `orders` in two commits (history load, then an
    * append + a keyed merge bump), with the STREAMING maintenance loop
    * ([[graft.streaming.GraftStreaming.martMaintainStream]]) run after
    * each — the manifest-tailing trigger wakes, `Incremental.refresh`
    * recomputes only the touched partitions. Returns the mart path.
    */
  private val mmOnce = new graft.engine.SessionKeyedCache[String]

  private def mmTable(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    mmOnce.getOrElseUpdate(s, s"mm:$dir",
      graft.engine.SessionKeyedCache.fileFingerprint(
        s, s"$dir/orders.parquet"))({
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_mm_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val src = s"$base/src"; val mart = s"$base/mart"
      val rows = t(s, dir, "orders")
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("k"),
          date_trunc("month", col("o_orderdate")).cast("date").as("d"),
          floor(col("o_totalprice") * 100).cast("bigint").as("cents"))
      def maintain(): Unit = {
        val q = graft.streaming.GraftStreaming.martMaintainStream(
          s, src, mart, "d", Seq("d", "bucket"), s"$base/ckpt")(srcDf =>
          srcDf.groupBy(col("d"), (col("k") % 10).as("bucket"))
            .agg(sum("cents").as("cents")))
        q.awaitTermination(300000); ()
      }
      // commit 1: the pre-1998 history; first refresh is the full build
      graft.engine.Upsert.upsertPartitioned(s, src,
        rows.filter(col("d") < lit("1998-01-01").cast("date")),
        Seq("k", "d"), "d")
      maintain()
      // commit 2+3: append the rest, then a keyed merge bumping 1996
      // cents by one — the second loop recomputes ONLY those partitions
      graft.engine.Upsert.append(s, src,
        rows.filter(col("d") >= lit("1998-01-01").cast("date")), Some("d"))
      graft.engine.Upsert.mergePartitioned(s, src,
        rows.filter(col("k") % 14 === 0 && year(col("d")) === 1996)
          .withColumn("cents", col("cents") + 1),
        Seq("k", "d"), "d")
      maintain()
      mart
    })

  /** Batch twin of the streaming CDC-to-mart loop: after two maintained
    * rounds (full build, then scoped refresh of appended + merged
    * partitions), the mart must equal the FROM-SCRATCH aggregate the
    * oracle computes over `orders` — incremental maintenance is
    * invisible in the result, only in the work done.
    */
  val qMartMaintain = QueryDef(
    "q_mart_maintain",
    (s, dir) => {
      val mart = mmTable(s, dir)
      graft.engine.Manifest.read(s, mart)
        .select(col("d"), col("bucket").cast("bigint").as("bucket"),
          col("cents").cast("bigint").as("cents"))
        .orderBy(col("d"), col("bucket"))
    },
    Some("""
      WITH s AS (
        SELECT o_orderkey AS k,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS d,
               CAST(floor(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 14 = 0
                       AND EXTRACT(year FROM o_orderdate) = 1996
                      THEN 1 ELSE 0 END AS cents
        FROM orders WHERE o_orderkey % 7 = 0)
      SELECT d, k % 10 AS bucket, CAST(sum(cents) AS BIGINT) AS cents
      FROM s GROUP BY 1, 2 ORDER BY 1, 2"""),
    bench = false)

  private val cdcStreamOnce = new graft.engine.SessionKeyedCache[String]

  /** The change feed through the PUBLIC STREAMING API
    * ([[graft.streaming.GraftStreaming.changeFeedStream]], round 14):
    * the consumer is positioned at the fixture's vFrom, the
    * manifest-tailing stream drains with `AvailableNow`, each delivered
    * batch appends to a sink directory, and the accumulated rows are
    * checked against the SAME from-scratch oracle as q_cdc_feed — the
    * streaming, TVF, and DataFrame formulations of the feed mutually
    * pin each other to one answer. The stream runs once per session
    * (durable consumer offset: a re-run delivers nothing new).
    */
  val qCdcStream = QueryDef(
    "q_cdc_stream",
    (s, dir) => {
      val (srcPath, vFrom, _) = cdcTable(s, dir)
      val outPath = cdcStreamOnce.getOrElseUpdate(s, s"cdcstream:$dir",
        graft.engine.SessionKeyedCache.fileFingerprint(
          s, s"$dir/orders.parquet"))({
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_cdcs_" +
          s"${s.sparkContext.applicationId}_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val sinkPath = s"$base/out"
        graft.engine.ChangeFeed.seekConsumer(s, srcPath, "q_cdc_stream",
          vFrom)
        graft.streaming.GraftStreaming.changeFeedStream(s, srcPath,
          Seq("o_orderkey"), "q_cdc_stream", s"$base/ckpt")(batch =>
          batch.write.mode("append").parquet(sinkPath))
          .awaitTermination()
        sinkPath
      })
      s.read.parquet(outPath)
        .select(col("o_orderkey"), col("price_cents"), col("d"),
          col(graft.engine.ChangeFeed.ChangeCol).as("change_type"))
        .orderBy(col("o_orderkey"), col("change_type"))
    },
    qCdcFeed.oracle)

  private val graftSourceOnce = new graft.engine.SessionKeyedCache[String]

  /** The change feed through the NAMED STREAMING SOURCE (round 18):
    * `spark.readStream.format("graft")` on the same fixture and
    * against the same from-scratch oracle as q_cdc_feed /
    * q_cdc_stream — the named source, the helper API, the TVF, and
    * the DataFrame formulation mutually pin each other to one answer.
    * The consumer offset is seeded at the fixture's vFrom, the stream
    * drains with `AvailableNow` into a parquet sink, and the durable
    * consumer pointer (advanced in `Source.commit`) makes a replay
    * deliver nothing new (StreamingSpec proves the checkpoint-LOSS
    * variant).
    */
  val qGraftSource = QueryDef(
    "q_graft_source",
    (s, dir) => {
      val (srcPath, vFrom, _) = cdcTable(s, dir)
      val outPath = graftSourceOnce.getOrElseUpdate(s, s"gsource:$dir",
        graft.engine.SessionKeyedCache.fileFingerprint(
          s, s"$dir/orders.parquet"))({
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_gsrc_" +
          s"${s.sparkContext.applicationId}_" +
          Integer.toHexString(dir.hashCode)
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val sinkPath = s"$base/out"
        graft.engine.ChangeFeed.seekConsumer(s, srcPath,
          "q_graft_source", vFrom)
        s.readStream.format("graft")
          .option("path", srcPath)
          .option("keyCols", "o_orderkey")
          .option("consumerId", "q_graft_source")
          .load()
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet")
          .option("path", sinkPath)
          .option("checkpointLocation", s"$base/ckpt")
          .start()
          .awaitTermination()
        sinkPath
      })
      s.read.parquet(outPath)
        .select(col("o_orderkey"), col("price_cents"), col("d"),
          col(graft.engine.ChangeFeed.ChangeCol).as("change_type"))
        .orderBy(col("o_orderkey"), col("change_type"))
    },
    qCdcFeed.oracle)

  val all: Seq[QueryDef] = Seq(qScd2, qWindowRangeFrame, qDqAudit, qBloomPrune,
    qBurstEvents, qIvmCounting, qZorderCluster, qSnapshotDiff, qFeedGaps,
    qTimeTravel, qStatsSkipping, qSchemaEvolution, qIncrementalMart, qCdcFeed,
    qSqlCdcFeed, qMvRewrite, qDeleteWhere, qUpdateWhere, qMartMaintain,
    qCdcStream, qGraftSource)
}
