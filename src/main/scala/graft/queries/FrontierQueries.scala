package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.DistributedRank
import graft.engine.Tables.t

/** Skyline / Pareto-frontier selection — "keep every row not dominated
  * on both criteria", the shape a curation pipeline uses to pick
  * quality-vs-cost-efficient sources (and a BI catalog uses for
  * best-value listings). Instantiated on `part`: minimize
  * (p_retailprice, p_size); a part is dominated iff some part is ≤ on
  * both axes and strictly < on at least one. Ties on BOTH axes are
  * kept (no strict direction), matching the textbook definition.
  *
  * 100 TB shape: the naive formulation is an all-pairs NOT EXISTS (the
  * oracle's luxury, not ours). Distributed, the 2-D skyline reduces to
  * one hash aggregate plus one global EXCLUSIVE prefix-min over the
  * per-price group table:
  *   1. `groupBy(price) → min(size)` — shuffles one row per distinct
  *      price, never the part payload;
  *   2. `DistributedRank.precmin` over price order — the two-phase
  *      range-partitioned engine (no single-task WindowExec; the same
  *      machinery as global_rank), giving each price the minimum size
  *      among all STRICTLY cheaper groups;
  *   3. survivors join back on price: on the frontier iff the row is
  *      min-size within its own price group AND every cheaper group's
  *      best size is strictly larger.
  * Strictness falls out of the decomposition: same-price domination is
  * step 3's within-group test, cross-price domination (price already
  * strictly smaller) needs only ≤ on size, which is `precmin ≤ size`,
  * rejected as `NOT (pmin > size)`. `p_retailprice` passes through
  * untouched (grouping/comparison only — raw pass-through is
  * hash-safe; no float arithmetic is performed).
  */
object FrontierQueries {

  val qSkyline = QueryDef(
    "q_skyline",
    (s, dir) => {
      val parts = t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      val groups = parts.groupBy(col("p_retailprice"))
        .agg(min(col("p_size").cast("bigint")).as("msize"))
      val frontier = DistributedRank(groups,
        Seq(col("p_retailprice").asc),
        DistributedRank.Spec(valueCol = Some("msize"),
          precMinCol = Some("pmin")))
      parts.join(frontier, Seq("p_retailprice"))
        .filter(col("p_size").cast("bigint") === col("msize") &&
          (col("pmin").isNull || col("pmin") > col("p_size")))
        .select(col("p_partkey"), col("p_retailprice").as("price"),
          col("p_size").as("size"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      WITH g AS (
        SELECT p_retailprice, MIN(CAST(p_size AS BIGINT)) AS msize
        FROM part GROUP BY p_retailprice),
      f AS (
        SELECT p_retailprice, msize,
               MIN(msize) OVER (ORDER BY p_retailprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmin
        FROM g)
      SELECT p.p_partkey, p.p_retailprice AS price, p.p_size AS size
      FROM part p JOIN f ON p.p_retailprice = f.p_retailprice
      WHERE CAST(p.p_size AS BIGINT) = f.msize
        AND (f.pmin IS NULL OR f.pmin > p.p_size)
      ORDER BY p.p_partkey"""))

  val all: Seq[QueryDef] = Seq(qSkyline)
}
