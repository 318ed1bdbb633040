package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables.t

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

  /** HLL++ distinct-count sketch next to the exact count. The sketch is
    * the 100 TB answer (fixed memory, mergeable across partitions);
    * Spark's HLL++ estimate is not bit-reproducible in DuckDB, so this
    * query has no SQL oracle — correctness is the rows-only driver check
    * plus the error-bound test in ScaleSpec.
    */
  val qApproxDistinct = QueryDef(
    "q_approx_distinct",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type")),
    None)

  /** KLL-style quantile sketch (`percentile_approx`, accuracy 1000 —
    * rank error ~1e-3 at ~1/10 the update cost of the 10000 default,
    * measured 3.1s → sub-second at sf0.1) next to the exact percentile
    * — the companion of
    * q_approx_distinct for the second classic sketch a 100 TB pipeline
    * needs (fixed-memory, mergeable across partitions; an exact
    * percentile needs a full sort or all values in memory per group).
    * Spark's sketch is not bit-reproducible in DuckDB → rows-only driver
    * check; the error bound is asserted in ScaleSpec.
    */
  val qApproxQuantiles = QueryDef(
    "q_approx_quantiles",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        // one sketch / one exact value-map buffer each for BOTH
        // quantiles (two scalar percentile calls would build two)
        percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.99)), lit(1000)).as("ap"),
        expr("percentile(l_extendedprice, array(0.5D, 0.99D))").as("ep"))
      .select(col("l_returnflag"),
        element_at(col("ap"), 1).as("approx_p50"),
        element_at(col("ap"), 2).as("approx_p99"),
        element_at(col("ep"), 1).as("exact_p50"),
        element_at(col("ep"), 2).as("exact_p99"))
      .orderBy(col("l_returnflag")),
    None)

  val all: Seq[QueryDef] = Seq(qSaltedJoin, qApproxDistinct, qApproxQuantiles)
}
