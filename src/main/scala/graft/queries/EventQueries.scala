package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables.t

/** Product-analytics surface over the `events` stream table: ordered
  * funnel progression and cohort retention — the two rollups every
  * event-warehouse user runs daily. Both are built as staged aggregates
  * joined on user_id: each stage is a partial/final hash aggregate and
  * every join is keyed on the same user_id the aggregates just
  * partitioned by, so AQE reuses the partitioning instead of adding
  * exchanges — no windows over the whole stream, no per-user state on
  * the driver.
  */
object EventQueries {

  /** Ordered signup → click → purchase funnel: a stage only counts when
    * it happens strictly AFTER the user's previous stage (min-ts per
    * stage, each constrained by the previous stage's min). `stage` is
    * how far the user got.
    */
  val qFunnel = QueryDef(
    "q_funnel",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_signup"))
      val click = ev.filter(col("event_type") === "click")
        .join(signup, Seq("user_id"))
        .filter(col("ts") > col("t_signup"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val purchase = ev.filter(col("event_type") === "purchase")
        .join(click, Seq("user_id"))
        .filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      signup
        .join(click, Seq("user_id"), "left")
        .join(purchase, Seq("user_id"), "left")
        .select(col("user_id"), col("t_signup"), col("t_click"), col("t_purchase"),
          (lit(1L) + when(col("t_click").isNotNull, 1L).otherwise(0L) +
            when(col("t_purchase").isNotNull, 1L).otherwise(0L)).as("stage"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH s AS (
        SELECT user_id, min(ts) AS t_signup FROM events
        WHERE event_type = 'signup' GROUP BY 1),
      c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.ts > s.t_signup GROUP BY 1),
      p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
      SELECT s.user_id, s.t_signup, c.t_click, p.t_purchase,
             CAST(1 + (CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END)
                    + (CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS stage
      FROM s LEFT JOIN c ON c.user_id = s.user_id
             LEFT JOIN p ON p.user_id = s.user_id
      ORDER BY s.user_id"""))

  /** Cohort retention: users grouped by first-seen day, counted once per
    * (cohort, day-offset) they were active. Two aggregates and one
    * user-keyed join — the distinct-per-day dedup happens in the same
    * shuffle as the count, so the heavy input collapses before the small
    * cohort rollup.
    */
  val qRetention = QueryDef(
    "q_retention",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val active = ev.distinct()
      active.join(cohorts, Seq("user_id"))
        .select(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""
      WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      cohorts AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
      SELECT c.cohort_day,
             CAST(date_diff('day', c.cohort_day, e.day) AS BIGINT) AS day_offset,
             count(*) AS n_users
      FROM ev e JOIN cohorts c ON c.user_id = e.user_id
      GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""))

  /** Dense-spine gap fill: per-user hourly activity counts on a gapless
    * hour grid from the user's first to last active hour, missing hours
    * filled with 0 — the regularization step before any fixed-step
    * time-series model. The spine is generated DISTRIBUTED, per user:
    * `sequence(h0, h1)` + `explode` runs on the executors, bounded by
    * the observed span (users < 20 keeps the demo output small; the
    * shape is per-key either way).
    *
    * Scale: no driver-side calendar loop, no cross join against a global
    * spine — each user's grid explodes next to its own bounds row, and
    * the left join back to the hourly counts is keyed on the same
    * (user_id, hour_id) the aggregate just shuffled by.
    */
  val qGapFill = QueryDef(
    "q_gap_fill",
    (s, dir) => {
      val hr = t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"),
          call_function("div", unix_micros(col("ts")), lit(3600000000L))
            .as("hour_id"))
      val hourly = hr.groupBy(col("user_id"), col("hour_id"))
        .agg(count(lit(1)).as("n_events"))
      val spine = hourly.groupBy(col("user_id"))
        .agg(min(col("hour_id")).as("h0"), max(col("hour_id")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"))).as("hour_id"))
      spine.join(hourly, Seq("user_id", "hour_id"), "left")
        .select(col("user_id"), col("hour_id"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy(col("user_id"), col("hour_id"))
    },
    Some("""
      WITH hr AS (
        SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id
        FROM events WHERE user_id < 20),
      hourly AS (
        SELECT user_id, hour_id, count(*) AS n_events
        FROM hr GROUP BY 1, 2),
      spine AS (
        SELECT user_id, unnest(generate_series(min(hour_id), max(hour_id)))
                 AS hour_id
        FROM hourly GROUP BY user_id)
      SELECT s.user_id, s.hour_id, COALESCE(h.n_events, 0) AS n_events
      FROM spine s LEFT JOIN hourly h USING (user_id, hour_id)
      ORDER BY user_id, hour_id"""))

  /** Robust per-type outlier audit: median / MAD (median absolute
    * deviation) with the |x − med| > 3·MAD rule — the outlier gate that,
    * unlike mean/stddev, is not dragged by the outliers it is hunting.
    *
    * Hash-match discipline: values travel as exact integer cents and
    * both medians are DISCRETE order statistics — the element at sorted
    * position (n+1)/2 of the per-type sort (lower median, pure integer
    * selection) — so no engine-specific quantile interpolation ever
    * runs; every output column is BIGINT.
    *
    * Scale (the q_winsorize route): event_type has a HANDFUL of
    * distinct values, so a fact-sized window partitioned by it is a
    * near-global funnel — instead the fact collapses ONCE into the
    * per-(type, cents) histogram (map-side combinable shuffle) and
    * every order statistic after that runs over histogram-sized input:
    * the median is the value whose cumulative count spans position
    * (n+1)/2, deviations re-histogram the HISTOGRAM (|values| rows,
    * not |fact|), and the outlier count is a cnt-weighted sum. The
    * fact is scanned exactly once, and no operator after the first
    * shuffle touches more than |distinct values| rows per type.
    */
  val qMadOutliers = QueryDef(
    "q_mad_outliers",
    (s, dir) => {
      val v = t(s, dir, "events")
        .select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
      val byType = Window.partitionBy(col("event_type"))
      // lower median of a cnt-weighted histogram: the value whose
      // cumulative count first reaches position (n+1) div 2
      def histMedian(hist: DataFrame, c: String, out: String): DataFrame = {
        val cum = sum(col("cnt")).over(byType.orderBy(col(c)))
        val pos = call_function("div",
          sum(col("cnt")).over(byType) + 1, lit(2L))
        hist.select(col("event_type"), col(c), col("cnt"),
          cum.as("cum"), pos.as("pos"))
          .filter(col("cum") - col("cnt") < col("pos") &&
            col("pos") <= col("cum"))
          .select(col("event_type"), col(c).as(out))
      }
      val hist = v.groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("cnt"))
      val med = histMedian(hist, "cents", "med_cents")
      val devHist = hist.join(broadcast(med), Seq("event_type"))
        .groupBy(col("event_type"),
          abs(col("cents") - col("med_cents")).as("ad"))
        .agg(sum(col("cnt")).as("cnt"))
      val mad = histMedian(devHist, "ad", "mad_cents")
      devHist.join(broadcast(med), Seq("event_type"))
        .join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"), col("med_cents"), col("mad_cents"))
        .agg(sum(when(col("ad") > lit(3L) * col("mad_cents"), col("cnt"))
          .otherwise(0L)).as("n_outliers"),
          max(col("ad")).as("max_abs_dev"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH v AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events),
      med AS (
        SELECT event_type, cents AS med_cents FROM (
          SELECT event_type, cents,
                 row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM v)
        WHERE rn = (n + 1) // 2),
      dev AS (
        SELECT v.event_type, abs(v.cents - m.med_cents) AS ad
        FROM v JOIN med m USING (event_type)),
      mad AS (
        SELECT event_type, ad AS mad_cents FROM (
          SELECT event_type, ad,
                 row_number() OVER (PARTITION BY event_type ORDER BY ad) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM dev)
        WHERE rn = (n + 1) // 2)
      SELECT d.event_type, m.med_cents, a.mad_cents,
             CAST(sum(CASE WHEN d.ad > 3 * a.mad_cents THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_outliers,
             max(d.ad) AS max_abs_dev
      FROM dev d JOIN med m USING (event_type) JOIN mad a USING (event_type)
      GROUP BY 1, 2, 3 ORDER BY event_type"""))

  /** Welch two-sample t-test on purchase value, variants assigned by
    * user hash parity — the experimentation readout (is B's mean spend
    * different from A's?) as one single-pass conditional aggregate:
    * per-variant n / Σcents / Σcents² collapse map-side; the statistic
    * is assembled from the six numbers on one row.
    *
    * Hash-exactness (q_covariance discipline): the cancellation-prone
    * `n·Q − S²` stays in decimal; the oracle converts it to double
    * THROUGH an int64 cast (DuckDB's int128-decimal→double
    * double-rounds past 2⁵³ — the ulp q_covariance measured at sf0.1 —
    * while int64→double matches Spark's correctly-rounded
    * Decimal→double to TPC-H sf ~30, and raises loudly beyond).
    * Everything after conversion is correctly-rounded double ops
    * (± × ÷ sqrt are IEEE-exact given identical inputs), so Spark and
    * DuckDB agree bit-for-bit even on the Welch–Satterthwaite degrees
    * of freedom.
    *
    * Scale: one scan, one row out — the partial aggregates are six
    * numbers per partition, mergeable forever (day-over-day CUPED-style
    * accumulation would reuse the identical partials).
    */
  val qAbTtest = QueryDef(
    "q_ab_ttest",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
      val isB = col("user_id") % 2 === 1
      def side(b: Boolean, c: Column) =
        sum(when(col("b") === lit(b), c).otherwise(lit(0L)))
      val agg = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(isB.as("b"), cents.as("cents"))
        .agg(
          side(false, lit(1L)).cast("decimal(12,0)").as("n1"),
          side(true, lit(1L)).cast("decimal(12,0)").as("n2"),
          side(false, col("cents")).cast("decimal(19,0)").as("s1"),
          side(true, col("cents")).cast("decimal(19,0)").as("s2"),
          side(false, col("cents") * col("cents")).cast("decimal(19,0)").as("q1"),
          side(true, col("cents") * col("cents")).cast("decimal(19,0)").as("q2"))
      def d38(c: Column) = c.cast("decimal(38,0)")
      def meanOf(sc: String, nc: String) =
        col(sc).cast("double") / col(nc).cast("double") / 100
      def varOverN(nc: String, sc: String, qc: String) =
        (d38(col(nc) * col(qc)) - d38(col(sc) * col(sc))).cast("double") /
          (col(nc) * (col(nc) - 1)).cast("double") / col(nc).cast("double")
      agg.select(
        col("n1").cast("bigint").as("n_a"), col("n2").cast("bigint").as("n_b"),
        meanOf("s1", "n1").as("mean_a"), meanOf("s2", "n2").as("mean_b"),
        (meanOf("s1", "n1") - meanOf("s2", "n2")).as("mean_diff"),
        // t in cents units: the ×100 turns the dollar mean-diff back
        // into cents to match the cents² variance
        ((meanOf("s1", "n1") - meanOf("s2", "n2")) * 100 /
          sqrt(varOverN("n1", "s1", "q1") + varOverN("n2", "s2", "q2")))
          .as("t_welch"),
        (pow(varOverN("n1", "s1", "q1") + varOverN("n2", "s2", "q2"), 2) /
          (pow(varOverN("n1", "s1", "q1"), 2) / (col("n1").cast("double") - 1) +
            pow(varOverN("n2", "s2", "q2"), 2) / (col("n2").cast("double") - 1)))
          .as("df_welch"))
    },
    Some("""
      WITH v AS (
        SELECT user_id % 2 = 1 AS b,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      m AS (
        SELECT
          CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS DECIMAL(12,0)) AS n1,
          CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS DECIMAL(12,0)) AS n2,
          CAST(SUM(CASE WHEN NOT b THEN cents ELSE 0 END) AS DECIMAL(19,0)) AS s1,
          CAST(SUM(CASE WHEN b THEN cents ELSE 0 END) AS DECIMAL(19,0)) AS s2,
          CAST(SUM(CASE WHEN NOT b THEN cents * cents ELSE 0 END) AS DECIMAL(19,0)) AS q1,
          CAST(SUM(CASE WHEN b THEN cents * cents ELSE 0 END) AS DECIMAL(19,0)) AS q2
        FROM v)
      SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100 AS mean_a,
             CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100 AS mean_b,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100 -
               CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100 AS mean_diff,
             (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100 -
              CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100) * 100 /
               sqrt(CAST(CAST(CAST(n1 * q1 AS DECIMAL(38,0)) -
                         CAST(s1 * s1 AS DECIMAL(38,0)) AS BIGINT) AS DOUBLE)
                      / CAST(n1 * (n1 - 1) AS DOUBLE) / CAST(n1 AS DOUBLE) +
                    CAST(CAST(CAST(n2 * q2 AS DECIMAL(38,0)) -
                         CAST(s2 * s2 AS DECIMAL(38,0)) AS BIGINT) AS DOUBLE)
                      / CAST(n2 * (n2 - 1) AS DOUBLE) / CAST(n2 AS DOUBLE))
               AS t_welch,
             pow(CAST(CAST(CAST(n1 * q1 AS DECIMAL(38,0)) -
                      CAST(s1 * s1 AS DECIMAL(38,0)) AS BIGINT) AS DOUBLE)
                   / CAST(n1 * (n1 - 1) AS DOUBLE) / CAST(n1 AS DOUBLE) +
                 CAST(CAST(CAST(n2 * q2 AS DECIMAL(38,0)) -
                      CAST(s2 * s2 AS DECIMAL(38,0)) AS BIGINT) AS DOUBLE)
                   / CAST(n2 * (n2 - 1) AS DOUBLE) / CAST(n2 AS DOUBLE), 2) /
               (pow(CAST(CAST(CAST(n1 * q1 AS DECIMAL(38,0)) -
                         CAST(s1 * s1 AS DECIMAL(38,0)) AS BIGINT) AS DOUBLE)
                      / CAST(n1 * (n1 - 1) AS DOUBLE) / CAST(n1 AS DOUBLE), 2)
                  / (CAST(n1 AS DOUBLE) - 1) +
                pow(CAST(CAST(CAST(n2 * q2 AS DECIMAL(38,0)) -
                         CAST(s2 * s2 AS DECIMAL(38,0)) AS BIGINT) AS DOUBLE)
                      / CAST(n2 * (n2 - 1) AS DOUBLE) / CAST(n2 AS DOUBLE), 2)
                  / (CAST(n2 AS DOUBLE) - 1)) AS df_welch
      FROM m"""))

  /** Time-series similarity search (EDBT'19-shaped): top-3 most similar
    * users by squared L2 distance between hourly activity vectors —
    * computed SPARSE. Each user's series is the (hour_id → count) map;
    * with zero-filled grids, ‖a−b‖² = n²(a) + n²(b) − 2·a·b and absent
    * hours contribute nothing, so the dot product is an equi-join of
    * the two users' nonzero hours — the series are never densified.
    *
    * Candidate semantics (the sparse-similarity contract): only
    * CO-ACTIVE pairs (≥ 1 shared nonzero hour) are scored — a pair
    * with disjoint activity shares no coordinate and is no candidate,
    * exactly as in sparse ANN. Restricted to user_id < 100 to keep the
    * demo output small; the shape is per-bucket either way.
    *
    * Scale: the join key is the hour bucket — fan-out per bucket is
    * (active users that hour)², which is the inverted-index cost every
    * sparse-similarity system pays; at 100 TB the bucket is sharded
    * (hour × user-hash salt) and heavy-hitter hours cap their posting
    * fan-out, same as the LSH band discipline. All arithmetic is exact
    * integer counts until the final d2 (itself a BIGINT).
    */
  val qTsSimilarity = QueryDef(
    "q_ts_similarity",
    (s, dir) => {
      val hourly = t(s, dir, "events")
        .filter(col("user_id") < 100)
        .select(col("user_id"),
          call_function("div", unix_micros(col("ts")), lit(3600000000L))
            .as("hour_id"))
        .groupBy(col("user_id"), col("hour_id"))
        .agg(count(lit(1)).as("n"))
      val n2 = hourly.groupBy(col("user_id"))
        .agg(sum(col("n") * col("n")).as("n2"))
      val dot = hourly.select(col("hour_id"), col("user_id").as("ua"),
          col("n").as("na"))
        .join(hourly.select(col("hour_id"), col("user_id").as("ub"),
          col("n").as("nb")), Seq("hour_id"))
        .filter(col("ua") =!= col("ub"))
        .groupBy(col("ua"), col("ub"))
        .agg(sum(col("na") * col("nb")).as("dot"))
      dot
        .join(broadcast(n2.select(col("user_id").as("ua"), col("n2").as("n2a"))),
          Seq("ua"))
        .join(broadcast(n2.select(col("user_id").as("ub"), col("n2").as("n2b"))),
          Seq("ub"))
        .select(col("ua").as("user_id"), col("ub").as("neighbor_id"),
          (col("n2a") + col("n2b") - lit(2L) * col("dot")).as("d2"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("d2"), col("neighbor_id"))).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("user_id"), col("rank"), col("neighbor_id"), col("d2"))
        .orderBy(col("user_id"), col("rank"))
    },
    Some("""
      WITH hourly AS (
        SELECT user_id, epoch_us(ts) // 3600000000 AS hour_id,
               count(*) AS n
        FROM events WHERE user_id < 100 GROUP BY 1, 2),
      n2 AS (
        SELECT user_id, CAST(sum(n * n) AS BIGINT) AS n2
        FROM hourly GROUP BY 1),
      dot AS (
        SELECT a.user_id AS ua, b.user_id AS ub,
               CAST(sum(a.n * b.n) AS BIGINT) AS dot
        FROM hourly a JOIN hourly b
          ON a.hour_id = b.hour_id AND a.user_id <> b.user_id
        GROUP BY 1, 2),
      scored AS (
        SELECT d.ua AS user_id, d.ub AS neighbor_id,
               na.n2 + nb.n2 - 2 * d.dot AS d2
        FROM dot d JOIN n2 na ON na.user_id = d.ua
                   JOIN n2 nb ON nb.user_id = d.ub)
      SELECT user_id, rank, neighbor_id, d2 FROM (
        SELECT user_id, neighbor_id, d2,
               CAST(row_number() OVER (PARTITION BY user_id
                 ORDER BY d2, neighbor_id) AS BIGINT) AS rank
        FROM scored)
      WHERE rank <= 3 ORDER BY user_id, rank"""))

  /** Rolling active-user counts: exact DAU and trailing-7-day WAU per
    * observed day — the engagement headline every event warehouse
    * computes. The trailing window is NOT a window function over the
    * stream: the stream first collapses to DISTINCT (day, user) pairs,
    * then each pair fans out to the ≤ 7 target days it contributes to
    * (explode of a 7-element sequence) and a plain hash aggregate
    * counts distinct users per target day.
    *
    * Scale: the fan-out factor is the window length on the DISTINCT
    * day-user relation (≪ raw events), every stage is keyed on day —
    * no global sort, no per-day self-joins. The approximate companion
    * at very long windows is the mergeable-sketch route
    * (q_approx_distinct); this is the exact form.
    */
  val qRollingDau = QueryDef(
    "q_rolling_dau",
    (s, dir) => {
      val du = t(s, dir, "events")
        .select(call_function("div", unix_micros(col("ts")),
          lit(86400000000L)).as("day_id"), col("user_id"))
        .distinct()
      val dau = du.groupBy(col("day_id"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val spine = du.select(col("day_id")).distinct()
      val wau = du
        .select(explode(sequence(col("day_id"), col("day_id") + 6))
          .as("day_id"), col("user_id"))
        .join(spine, Seq("day_id"))
        .groupBy(col("day_id"))
        .agg(countDistinct(col("user_id")).as("wau7"))
      dau.join(wau, Seq("day_id")).orderBy(col("day_id"))
    },
    Some("""
      WITH du AS (
        SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_id, user_id
        FROM events),
      spine AS (SELECT DISTINCT day_id FROM du),
      dau AS (SELECT day_id, count(DISTINCT user_id) AS dau
              FROM du GROUP BY 1),
      contrib AS (
        SELECT unnest(generate_series(day_id, day_id + 6)) AS day_id, user_id
        FROM du),
      wau AS (
        SELECT c.day_id, count(DISTINCT c.user_id) AS wau7
        FROM contrib c JOIN spine s USING (day_id) GROUP BY 1)
      SELECT day_id, dau, wau7 FROM dau JOIN wau USING (day_id)
      ORDER BY day_id"""))

  /** Bitwise behavior segmentation: each (user, day) collapses to one
    * integer bitmask (one bit per event type seen that day) via the
    * `bit_or` aggregate, and the corpus rolls up to segment sizes — the
    * compact audience-segmentation encoding (a 64-type vocabulary fits
    * one BIGINT per key, set-intersection becomes bitwise AND
    * downstream). Day-scoped because over the full month every user
    * hits every type (one 31-mask row — no check signal); daily masks
    * exercise all 31 combinations.
    *
    * Scale: one map-side-combinable aggregate per (user, day), one tiny
    * rollup over ≤ 2^|types| masks; no joins, no windows, and the
    * per-key state is 8 bytes regardless of event volume.
    */
  val qUserSegments = QueryDef(
    "q_user_segments",
    (s, dir) => {
      val bit = when(col("event_type") === "click", 1L)
        .when(col("event_type") === "error", 2L)
        .when(col("event_type") === "purchase", 4L)
        .when(col("event_type") === "signup", 8L)
        .when(col("event_type") === "view", 16L)
        .otherwise(0L)
      t(s, dir, "events")
        .groupBy(col("user_id"),
          call_function("div", unix_micros(col("ts")), lit(86400000000L))
            .as("day_id"))
        .agg(call_function("bit_or", bit).as("segment_mask"))
        .groupBy(col("segment_mask"))
        .agg(count(lit(1)).as("n_user_days"))
        .orderBy(col("segment_mask"))
    },
    Some("""
      WITH m AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day_id,
               bit_or(CASE event_type
                 WHEN 'click' THEN 1 WHEN 'error' THEN 2
                 WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                 WHEN 'view' THEN 16 ELSE 0 END) AS segment_mask
        FROM events GROUP BY 1, 2)
      SELECT CAST(segment_mask AS BIGINT) AS segment_mask,
             count(*) AS n_user_days
      FROM m GROUP BY 1 ORDER BY segment_mask"""))

  /** Peak concurrency per day — the classic interval sweep: each event
    * opens a 10-minute [start, end) interval; intervals are clipped to
    * day boundaries, each endpoint becomes a ±1 delta, and the per-day
    * running sum's maximum is the day's peak simultaneous load. Ends
    * sort before starts at the same instant (half-open semantics), and
    * the daily MAX is invariant to tie order within equal (t, Δ) runs,
    * so the result is engine-deterministic without global tie-breaks.
    *
    * Scale: the sweep partitions by day — per-day sorts of 2×|events
    * that day|, never a global ordering; the midnight clip is an
    * explode to at most 2 segments per interval.
    */
  val qPeakConcurrency = QueryDef(
    "q_peak_concurrency",
    (s, dir) => {
      val day = 86400000000L
      val iv = t(s, dir, "events")
        .select(unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) + 600000000L).as("e"))
      val seg = iv
        .select(explode(sequence(call_function("div", col("s"), lit(day)),
          call_function("div", col("e") - 1, lit(day)))).as("day_id"),
          col("s"), col("e"))
        .select(col("day_id"),
          greatest(col("s"), col("day_id") * day).as("s"),
          least(col("e"), (col("day_id") + 1) * day).as("e"))
      val pts = seg.select(col("day_id"), col("s").as("t"), lit(1L).as("d"))
        .unionAll(seg.select(col("day_id"), col("e").as("t"),
          lit(-1L).as("d")))
      val w = Window.partitionBy(col("day_id")).orderBy(col("t"), col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pts.withColumn("c", sum(col("d")).over(w))
        .groupBy(col("day_id")).agg(max(col("c")).as("peak_concurrency"))
        .orderBy(col("day_id"))
    },
    Some("""
      WITH iv AS (
        SELECT epoch_us(ts) AS s, epoch_us(ts) + 600000000 AS e FROM events),
      seg AS (
        SELECT unnest(generate_series(s // 86400000000, (e - 1) // 86400000000))
                 AS day_id, s, e
        FROM iv),
      seg2 AS (
        SELECT day_id, GREATEST(s, day_id * 86400000000) AS s,
               LEAST(e, (day_id + 1) * 86400000000) AS e
        FROM seg),
      pts AS (
        SELECT day_id, s AS t, 1 AS d FROM seg2
        UNION ALL SELECT day_id, e, -1 FROM seg2),
      run AS (
        SELECT day_id, SUM(d) OVER (PARTITION BY day_id ORDER BY t, d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM pts)
      SELECT day_id, CAST(MAX(c) AS BIGINT) AS peak_concurrency
      FROM run GROUP BY day_id ORDER BY day_id"""))

  /** Event-type transition matrix: per-user consecutive event bigrams
    * (lead over the user's timeline) counted corpus-wide, with each
    * from-type row normalized to transition probabilities — the
    * first-order Markov model behind next-action prediction and
    * anomaly scoring. Counts are exact BIGINT; the one double is the
    * final row-normalizing division (sum window over the 5×5 matrix,
    * not the stream).
    *
    * Scale: a single (user_id; ts) window pass — one shuffle — then a
    * hash aggregate to the |types|² matrix; normalization runs on the
    * matrix itself.
    */
  val qEventTransitions = QueryDef(
    "q_event_transitions",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("from_type"))
        .withColumn("to_type", lead(col("from_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("from_type"))))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""
      WITH bi AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS to_type
        FROM events),
      m AS (
        SELECT from_type, to_type, count(*) AS n
        FROM bi WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
             CAST(n AS DOUBLE) /
               CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS p
      FROM m ORDER BY from_type, to_type"""))

  /** Top opening paths: each user's first three events (by time)
    * assembled into an ordered path string, counted across the corpus
    * — the "how do sessions start" report. The per-user sequence is
    * one rank window + three conditional MINs (no collect_list whose
    * order the aggregate would not guarantee), so the path is
    * deterministic by construction.
    *
    * Scale: rank window and aggregate both partition by user_id — one
    * shuffle; WindowGroupLimit prunes each user to 3 rows map-side
    * before the shuffle (same plan shape PlanSpec asserts for
    * q_lateral_topk).
    */
  val qTopPaths = QueryDef(
    "q_top_paths",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val step = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
      step.groupBy(col("user_id"))
        .agg(min(when(col("rn") === 1, col("event_type"))).as("s1"),
          min(when(col("rn") === 2, col("event_type"))).as("s2"),
          min(when(col("rn") === 3, col("event_type"))).as("s3"))
        .filter(col("s3").isNotNull)
        .select(concat_ws(" > ", col("s1"), col("s2"), col("s3")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
    },
    Some("""
      WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS rn
        FROM events),
      p AS (
        SELECT user_id,
               min(CASE WHEN rn = 1 THEN event_type END) AS s1,
               min(CASE WHEN rn = 2 THEN event_type END) AS s2,
               min(CASE WHEN rn = 3 THEN event_type END) AS s3
        FROM r WHERE rn <= 3 GROUP BY user_id)
      SELECT s1 || ' > ' || s2 || ' > ' || s3 AS path, count(*) AS n_users
      FROM p WHERE s3 IS NOT NULL
      GROUP BY 1 ORDER BY n_users DESC, path"""))

  /** Position-based multi-touch attribution: every purchase's value is
    * credited across the user's clicks in the trailing 7 days —
    * 40% to the first touch, 40% to the last, 20% split across the
    * middles (the standard U-shaped model; with no middles the 20%
    * redistributes equally, so two-touch journeys split 50/50 and
    * single-touch conversions take 100%). Credit is exact integer
    * cents with floor division and ALL rounding slack assigned to the
    * last touch, so per-conversion credit sums to the purchase value
    * bit-exactly.
    *
    * Scale: the touch join is equi-keyed on user_id with the time
    * window as residual — per-user work only; ranking and counting
    * share one conversion-keyed window partitioning (one shuffle).
    * Credit math is per-row arithmetic.
    */
  val qMultitouch = QueryDef(
    "q_multitouch",
    (s, dir) => {
      val weekUs = 604800000000L
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      val ev = t(s, dir, "events")
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("conv_id"),
          unix_micros(col("ts")).as("pts"), cents.as("cents"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          unix_micros(col("ts")).as("cts"))
      val touches = conv.join(clicks, Seq("user_id"))
        .filter(col("cts") >= col("pts") - weekUs && col("cts") < col("pts"))
      val byConv = Window.partitionBy(col("conv_id"))
      val ranked = touches
        .withColumn("rn", row_number()
          .over(byConv.orderBy(col("cts"), col("click_id"))).cast("long"))
        .withColumn("cnt", count(lit(1)).over(byConv))
      val d = (a: Column, b: Column) => call_function("div", a, b)
      val firstC = when(col("cnt") === 1, col("cents"))
        .when(col("cnt") === 2, d(col("cents") * 50, lit(100L)))
        .otherwise(d(col("cents") * 40, lit(100L)))
      val midC = d(d(col("cents") * 20, lit(100L)), col("cnt") - 2)
      val credit = when(col("rn") === 1, firstC)
        .when(col("rn") === col("cnt"), col("cents") - firstC -
          when(col("cnt") > 2, midC * (col("cnt") - 2)).otherwise(0L))
        .otherwise(midC)
      ranked.select(col("user_id"), col("conv_id"), col("click_id"),
        col("rn"), col("cnt"), credit.as("credit_cents"))
        .orderBy(col("conv_id"), col("rn"))
    },
    Some("""
      WITH p AS (
        SELECT user_id, event_id AS conv_id, epoch_us(ts) AS pts,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id, event_id AS click_id, epoch_us(ts) AS cts
        FROM events WHERE event_type = 'click'),
      tch AS (
        SELECT p.user_id, p.conv_id, p.cents, c.click_id, c.cts
        FROM p JOIN c USING (user_id)
        WHERE c.cts >= p.pts - 604800000000 AND c.cts < p.pts),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY conv_id
                    ORDER BY cts, click_id) AS rn,
               count(*) OVER (PARTITION BY conv_id) AS cnt
        FROM tch)
      SELECT user_id, conv_id, click_id, rn, cnt,
             CASE WHEN rn = 1 THEN
                    CASE WHEN cnt = 1 THEN cents
                         WHEN cnt = 2 THEN cents * 50 // 100
                         ELSE cents * 40 // 100 END
                  WHEN rn = cnt THEN cents
                    - CASE WHEN cnt = 2 THEN cents * 50 // 100
                           ELSE cents * 40 // 100 END
                    - CASE WHEN cnt > 2
                           THEN (cents * 20 // 100 // (cnt - 2)) * (cnt - 2)
                           ELSE 0 END
                  ELSE cents * 20 // 100 // (cnt - 2) END AS credit_cents
      FROM r ORDER BY conv_id, rn"""))

  /** Cohort lifetime value: users grouped by their signup week, revenue
    * tracked per week-of-age — the money-weighted counterpart of
    * q_retention's activity matrix (cohort curves are how growth teams
    * read payback). Revenue is exact integer cents; buyers are exact
    * distinct counts.
    *
    * Scale: two user-keyed aggregates joined on user_id (AQE reuses the
    * partitioning), then a matrix-sized rollup — the stream is never
    * windowed or sorted globally.
    */
  val qCohortLtv = QueryDef(
    "q_cohort_ltv",
    (s, dir) => {
      val weekUs = 604800000000L
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      val ev = t(s, dir, "events")
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("t0"))
        .select(col("user_id"),
          call_function("div", col("t0"), lit(weekUs)).as("cohort_week"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          call_function("div", unix_micros(col("ts")), lit(weekUs)).as("wk"),
          cents.as("cents"))
      purch.join(cohort, Seq("user_id"))
        .filter(col("wk") >= col("cohort_week"))
        .groupBy(col("cohort_week"),
          (col("wk") - col("cohort_week")).as("age_weeks"))
        .agg(countDistinct(col("user_id")).as("n_buyers"),
          sum(col("cents")).as("revenue_cents"))
        .orderBy(col("cohort_week"), col("age_weeks"))
    },
    Some("""
      WITH cohort AS (
        SELECT user_id, min(epoch_us(ts)) // 604800000000 AS cohort_week
        FROM events WHERE event_type = 'signup' GROUP BY user_id),
      purch AS (
        SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase')
      SELECT cohort_week, wk - cohort_week AS age_weeks,
             count(DISTINCT user_id) AS n_buyers,
             CAST(SUM(cents) AS BIGINT) AS revenue_cents
      FROM purch JOIN cohort USING (user_id)
      WHERE wk >= cohort_week
      GROUP BY 1, 2 ORDER BY cohort_week, age_weeks"""))

  /** Weekly churn: users active in week w but silent in week w+1 — the
    * retention matrix's inverse, reported as per-week churned/retained
    * counts with the churn rate. Built from the DISTINCT (week, user)
    * relation with a self anti-join shifted by one week (no windows
    * over the stream, no per-user state).
    *
    * Scale: the distinct relation is ≪ the stream; both the join and
    * the rollup key on week — partitions scale out with history. The
    * last observed week has no lookahead and is excluded (its churn is
    * undefined, not zero).
    */
  val qChurn = QueryDef(
    "q_churn",
    (s, dir) => {
      val wu = t(s, dir, "events")
        .select(call_function("div", unix_micros(col("ts")),
          lit(604800000000L)).as("wk"), col("user_id"))
        .distinct()
      val next = wu.select((col("wk") - 1).as("wk"),
        col("user_id"), lit(1L).as("active_next"))
      val lastWk = wu.agg(max(col("wk")).as("last_wk"))
      wu.join(next, Seq("wk", "user_id"), "left")
        .crossJoin(broadcast(lastWk))
        .filter(col("wk") < col("last_wk"))
        .groupBy(col("wk"))
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("active_next").isNull, 1L).otherwise(0L))
            .as("n_churned"))
        .withColumn("churn_rate",
          col("n_churned").cast("double") / col("n_active"))
        .orderBy(col("wk"))
    },
    Some("""
      WITH wu AS (
        SELECT DISTINCT epoch_us(ts) // 604800000000 AS wk, user_id
        FROM events),
      lastwk AS (SELECT max(wk) AS last_wk FROM wu)
      SELECT a.wk, count(*) AS n_active,
             CAST(SUM(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_churned,
             CAST(SUM(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END)
               AS DOUBLE) / count(*) AS churn_rate
      FROM wu a LEFT JOIN wu b
        ON b.wk = a.wk + 1 AND b.user_id = a.user_id
      WHERE a.wk < (SELECT last_wk FROM lastwk)
      GROUP BY a.wk ORDER BY a.wk"""))

  /** RFM segmentation: every purchasing user scored 1–5 on Recency
    * (last purchase day), Frequency (purchase count), and Monetary
    * (exact cents), segments = score triples with user counts — the
    * standard customer-base map. Quintiles are rank-based integers
    * (`(rk−1)·5 div n + 1` with a user_id tie-break), so no float
    * percentile and no ntile tie nondeterminism exists anywhere.
    *
    * Scale: one purchase aggregate keyed by user, then three
    * [[graft.engine.DistributedRank]] passes over the USER relation
    * (≪ events) — each a range-partitioned sort, never a single-task
    * global window, with the user count attached from phase-1 stats —
    * and a ≤125-cell rollup.
    */
  val qRfmSegments = QueryDef(
    "q_rfm_segments",
    (s, dir) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
      val per = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(call_function("div", unix_micros(col("ts")),
          lit(86400000000L))).as("last_day"),
          count(lit(1)).as("freq"), sum(cents).as("monetary"))
      def score(df: org.apache.spark.sql.DataFrame, c: Column,
          out: String): org.apache.spark.sql.DataFrame =
        graft.engine.DistributedRank(df, Seq(c, col("user_id")),
          graft.engine.DistributedRank.Spec(rankCol = Some("__rk"),
            countCol = Some("__n")))
          .withColumn(out,
            call_function("div", (col("__rk") - 1) * 5, col("__n")) + 1)
          .drop("__rk", "__n")
      val scored = score(score(score(per,
        col("last_day"), "r_score"),
        col("freq"), "f_score"),
        col("monetary"), "m_score")
      scored
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    },
    Some("""
      WITH per AS (
        SELECT user_id,
               max(epoch_us(ts) // 86400000000) AS last_day,
               count(*) AS freq,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS BIGINT) AS monetary
        FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      scored AS (
        SELECT (row_number() OVER (ORDER BY last_day, user_id) - 1) * 5
                 // (count(*) OVER ()) + 1 AS r_score,
               (row_number() OVER (ORDER BY freq, user_id) - 1) * 5
                 // (count(*) OVER ()) + 1 AS f_score,
               (row_number() OVER (ORDER BY monetary, user_id) - 1) * 5
                 // (count(*) OVER ()) + 1 AS m_score
        FROM per)
      SELECT r_score, f_score, m_score, count(*) AS n_users
      FROM scored GROUP BY 1, 2, 3
      ORDER BY r_score, f_score, m_score"""))

  val all: Seq[QueryDef] =
    Seq(qFunnel, qRetention, qGapFill, qMadOutliers, qAbTtest, qTsSimilarity,
      qRollingDau, qUserSegments, qPeakConcurrency, qEventTransitions,
      qTopPaths, qMultitouch, qCohortLtv, qChurn, qRfmSegments)
}
