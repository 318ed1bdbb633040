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

  val all: Seq[QueryDef] = Seq(qWindowHourly, qWindowSliding)
}
