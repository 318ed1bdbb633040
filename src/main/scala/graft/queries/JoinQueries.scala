package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables.t

/** Temporal join extensions (operators Spark has no built-in for,
  * composed from existing ops per the SURVEY §7.5 preference order —
  * no custom physical operator needed, and both shapes are the
  * standard 100 TB-safe formulations).
  */
object JoinQueries {

  /** As-of join: each error event picks the MOST RECENT click (same
    * user, click ts ≤ error ts) — DuckDB/kdb `ASOF JOIN` semantics.
    *
    * Spark-native shape: union both sides, one running `last(click_ts)
    * ignore nulls` window per user. One hash shuffle on user_id, a
    * running (rows-frame) window with O(1) state per row — no range
    * self-join, no per-row backward scan, so the plan is linear at any
    * scale (the same trick Flink uses for temporal joins). Clicks sort
    * before errors at an equal timestamp (`side` tiebreak), giving the
    * ASOF `>=` inclusive bound.
    */
  val qAsofJoin = QueryDef(
    "q_asof_join",
    (s, dir) => {
      val tagged = t(s, dir, "events")
        .filter(col("event_type").isin("click", "error"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "click", 0).otherwise(1).as("side"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("click_ts",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1 && col("click_ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts").as("error_ts"),
          col("click_ts"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
           c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      SELECT e.event_id, e.user_id, e.ts AS error_ts, c.ts AS click_ts,
             date_diff('microsecond', c.ts, e.ts) AS gap_us
      FROM e ASOF JOIN c ON e.user_id = c.user_id AND e.ts >= c.ts
      ORDER BY e.event_id"""))

  /** Interval (range) join: all (error, click) pairs of the same user
    * within ±6 hours — the inequality-join shape engines execute as an
    * IEJoin / interval join.
    *
    * Spark-native shape: band the time axis into window-sized buckets;
    * clicks land in their own bucket, each error probes its bucket ± 1
    * (three candidates cover the whole ±window by construction, and
    * each (error, click) pair meets in EXACTLY one candidate — no
    * dedup). The O(n²) inequality predicate becomes an equi-join on
    * (user_id, bucket) with quadratic work only inside a (user, 6 h)
    * cell — bounded by per-user event rate, independent of corpus size.
    */
  val qRangeJoin = QueryDef(
    "q_range_join",
    (s, dir) => {
      val WindowUs = 6L * 3600 * 1000000
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val bucket = call_function("div", col("us"), lit(WindowUs))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), bucket.as("b"),
          col("event_id").as("click_id"), col("us").as("c_us"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"),
          explode(array(bucket - 1, bucket, bucket + 1)).as("b"),
          col("event_id").as("error_id"), col("us").as("e_us"))
      errors.join(clicks, Seq("user_id", "b"))
        .filter(col("c_us") >= col("e_us") - WindowUs &&
          col("c_us") <= col("e_us") + WindowUs)
        .select(col("error_id"), col("click_id"),
          (col("c_us") - col("e_us")).as("dt_us"))
        .orderBy(col("error_id"), col("click_id"))
    },
    Some("""
      WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
           c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      SELECT e.event_id AS error_id, c.event_id AS click_id,
             date_diff('microsecond', e.ts, c.ts) AS dt_us
      FROM e JOIN c ON e.user_id = c.user_id
                   AND c.ts BETWEEN e.ts - INTERVAL 6 HOUR
                                AND e.ts + INTERVAL 6 HOUR
      ORDER BY error_id, click_id"""))

  /** The same range-join semantics written the NAIVE way — a bare
    * `abs(a − b) <= W` predicate with no key at all (any error paired
    * with any click within ±30 s, across users). Without intervention
    * Spark plans this as a BroadcastNestedLoopJoin (O(|e|·|c|)); the
    * [[graft.plans.BandedRangeJoin]] optimizer rule rewrites it to the
    * banded equi-join automatically. BandedRangeJoinSpec asserts the
    * plan shape; this query hash-checks the rewrite's results against
    * the oracle's literal inequality join.
    */
  val qRangeJoinAuto = QueryDef(
    "q_range_join_auto",
    (s, dir) => {
      val WindowUs = 30L * 1000000
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("us").as("e_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("us").as("c_us"))
      errors.join(clicks, abs(col("e_us") - col("c_us")) <= lit(WindowUs))
        .select(col("error_id"), col("click_id"),
          (col("c_us") - col("e_us")).as("dt_us"))
        .orderBy(col("error_id"), col("click_id"))
    },
    Some("""
      WITH e AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
           c AS (SELECT event_id, ts FROM events WHERE event_type = 'click')
      SELECT e.event_id AS error_id, c.event_id AS click_id,
             date_diff('microsecond', e.ts, c.ts) AS dt_us
      FROM e JOIN c
        ON abs(date_diff('microsecond', c.ts, e.ts)) <= 30000000
      ORDER BY error_id, click_id"""))

  val all: Seq[QueryDef] = Seq(qAsofJoin, qRangeJoin, qRangeJoinAuto)
}
