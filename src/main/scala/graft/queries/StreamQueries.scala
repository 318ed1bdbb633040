package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.streaming.GraftStreaming

/** Batch-checkable registrations of the streaming window operators
  * (SURVEY §2.8 extension surface): the SAME [[GraftStreaming]] plan
  * fragments run here over the `events` table so the DuckDB oracle can
  * hash-check window assignment and exact-cents aggregation; the
  * streaming-only semantics (watermark, late-data drop, AvailableNow
  * drain) are asserted in StreamingSpec.
  */
object StreamQueries {

  /** Tumbling 1-hour event-time windows. Spark's `window().start` for a
    * tumbling window is epoch-aligned — identical to `date_trunc`.
    */
  val qWindowHourly = QueryDef(
    "q_window_hourly",
    (s, dir) => GraftStreaming.windowedEventStats(t(s, dir, "events"), "1 hour")
      .orderBy(col("window_start"), col("event_type")),
    Some("""
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             event_type, count(*) AS n_events,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100 AS sum_value
      FROM events
      GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** Sliding windows, 2 hours long every hour: each event lands in two
    * windows — mirrored in SQL by unnesting the two window starts.
    */
  val qWindowSliding = QueryDef(
    "q_window_sliding",
    (s, dir) => GraftStreaming.slidingEventCounts(
      t(s, dir, "events"), "2 hours", "1 hour")
      .orderBy(col("window_start"), col("event_type")),
    Some("""
      SELECT window_start, event_type, count(*) AS n_events
      FROM (
        SELECT unnest([CAST(date_trunc('hour', ts) AS TIMESTAMP),
                       CAST(date_trunc('hour', ts) - INTERVAL 1 HOUR AS TIMESTAMP)]) AS window_start,
               event_type
        FROM events)
      GROUP BY window_start, event_type
      ORDER BY window_start, event_type"""))

  /** Batch registration of the stream-stream interval join
    * ([[GraftStreaming.clickAttribution]]): purchases left-outer joined
    * to the same user's clicks within the 10-minute lookback, rolled up
    * to a per-purchase click count. The plan is the scale shape you
    * want: equi key (user_id) drives a hash join, the time band is a
    * residual predicate — never a nested loop.
    */
  val qClickAttribution = QueryDef(
    "q_click_attribution",
    (s, dir) => {
      val ev = t(s, dir, "events")
      GraftStreaming.clickAttribution(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"))
        .groupBy(col("p_id"), col("p_user"), col("p_ts"))
        .agg(count(col("c_id")).as("n_clicks"))
        .orderBy(col("p_id"))
    },
    Some("""
      SELECT p.event_id AS p_id, p.user_id AS p_user, p.ts AS p_ts,
             count(c.event_id) AS n_clicks
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id
       AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
      GROUP BY 1, 2, 3 ORDER BY p_id"""))

  /** Batch twin of [[graft.streaming.TopTypeTracker]] (the MapState
    * leaderboard): each user's dominant event type — argmax count with
    * the same (count desc, type asc) tie-break the processor emits, plus
    * the user's total volume. The streaming op's final emission per key
    * must equal these rows (asserted in StreamingSpec); here the rollup
    * itself is hash-checked. One shuffle to the per-(user, type) counts;
    * the window partitions by data-scaled user_id — no global funnel.
    */
  val qTopEventType = QueryDef(
    "q_top_event_type",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type"))
      t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("event_type"), col("n"),
          row_number().over(w).as("rn"),
          sum(col("n")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("user_id")))
            .as("n_total"))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("top_type"),
          col("n").as("top_n"), col("n_total"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rn,
               CAST(SUM(n) OVER (PARTITION BY user_id) AS BIGINT) AS n_total
        FROM c)
      SELECT user_id, event_type AS top_type, n AS top_n, n_total
      FROM r WHERE rn = 1 ORDER BY user_id"""))

  val all: Seq[QueryDef] = Seq(qWindowHourly, qWindowSliding,
    qClickAttribution, qTopEventType)
}
