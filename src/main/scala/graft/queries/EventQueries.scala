package graft.queries

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

  val all: Seq[QueryDef] = Seq(qFunnel, qRetention)
}
