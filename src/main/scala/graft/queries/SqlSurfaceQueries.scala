package graft.queries

import org.apache.spark.sql.functions._

import graft.engine.Tables.t

/** The SQL entry points for the library engines (SURVEY §2.9 /
  * round-7 verdict item 6): a user coming from the reference's
  * SQL-only world reaches the distributed-rank and grouped-quantiles
  * machinery through `spark.sql` text alone — no DataFrame API —
  * via the GraftExtensions table functions (`plans/GlobalRank.scala`,
  * `plans/GroupedQuantilesTvf.scala`). Both queries are oracle-checked
  * against the standard-SQL equivalents they replace.
  */
object SqlSurfaceQueries {

  /** Top-100 orders by price through `global_rank` — the TVF plans the
    * two-phase range-partitioned rank (no single-task WindowExec), and
    * must agree with `row_number() OVER (ORDER BY …)` exactly.
    */
  val qSqlGlobalRank = QueryDef(
    "q_sql_global_rank",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_sql_v")
      s.sql("""
        SELECT o_orderkey, o_totalprice, rk
        FROM global_rank('orders_sql_v', 'o_totalprice DESC, o_orderkey', 'rk')
        WHERE rk <= 100
        ORDER BY rk""")
    },
    Some("""
      SELECT o_orderkey, o_totalprice, rk FROM (
        SELECT o_orderkey, o_totalprice,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                 AS rk
        FROM orders)
      WHERE rk <= 100
      ORDER BY rk"""))

  /** Grouped exact interpolated quantiles through `grouped_quantiles`
    * — the TVF expands to the histogram-refinement plan at analysis
    * time and must match `quantile_cont` bitwise on exact cents (same
    * discipline as q_percentiles, which exercises the same engine
    * through the DataFrame API).
    */
  val qSqlGroupedQuantiles = QueryDef(
    "q_sql_grouped_quantiles",
    (s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("bigint")
            .as("cents"))
        .createOrReplaceTempView("events_cents_v")
      s.sql("""
        SELECT event_type,
               p50 / 100 AS p50_value,
               p95 / 100 AS p95_value
        FROM grouped_quantiles('events_cents_v', 'event_type', 'cents',
                               'p50=0.5,p95=0.95')
        ORDER BY event_type""")
    },
    Some("""
      SELECT event_type,
             quantile_cont(cents, 0.5) / 100 AS p50_value,
             quantile_cont(cents, 0.95) / 100 AS p95_value
      FROM (SELECT event_type,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
            FROM events)
      GROUP BY event_type
      ORDER BY event_type"""))

  /** PageRank through the `pagerank` TVF (`plans/PageRankTvf.scala`) —
    * the analysis-time expansion of the K-level recurrence — over the
    * session-cached fulfillment edge list registered as a view. Must
    * agree bit-for-bit with the DataFrame form (q_pagerank): same
    * oracle, same exact-integer recurrence. The TVF recomputes the
    * degree weighting from the view (it accepts ANY edge relation), so
    * this also proves the weighting is derivable from the edge list
    * alone.
    */
  val qSqlPagerank = QueryDef(
    "q_sql_pagerank",
    (s, dir) => {
      GraphQueries.undirectedEdges(s, dir)
        .createOrReplaceTempView("fulfillment_edges_v")
      s.sql(s"""
        SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
                 AS node_type,
               node DIV 2 AS node_key, pr
        FROM pagerank('fulfillment_edges_v', 'src', 'dst',
                      ${GraphQueries.Iters})
        ORDER BY node_type, node_key""")
    },
    Some(GraphQueries.pagerankOracle))

  /** Weakly connected components through the `connected_components`
    * TVF (`plans/ComponentsTvf.scala`) — K levels of the zero-weight
    * self-loop min-relaxation expanded at analysis time. Shares its
    * oracle with q_components (the until-convergence LabelPropagation
    * form), so this one query pins three implementations to each
    * other: declarative fixed-K, pointer-doubling fixpoint, and the
    * unrolled SQL CTE — and re-proves per run that every fulfillment
    * component's radius from its min node is ≤ the round bound.
    */
  val qSqlComponents = QueryDef(
    "q_sql_components",
    (s, dir) => {
      GraphQueries.undirectedEdges(s, dir)
        .createOrReplaceTempView("fulfillment_edges_v")
      s.sql(s"""
        SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
                 AS node_type,
               node DIV 2 AS node_key, component
        FROM connected_components('fulfillment_edges_v', 'src', 'dst',
                                  ${GraphQueries.ComponentsRounds})
        ORDER BY node_type, node_key""")
    },
    Some(GraphQueries.componentsOracle))

  /** Personalized PageRank through the `ppr` TVF
    * (`plans/PprTvf.scala`) — the library's first TWO-relation table
    * function: the fulfillment edge list and the seed-supplier set
    * each registered as a view and resolved by name through the
    * BinaryNode placeholder. Shares q_ppr's oracle, so the pair pins
    * the DataFrame chain, the TVF expansion, and the unrolled SQL CTE
    * to each other — and the TVF re-derives the degree weighting from
    * the edge view, proving the recurrence needs nothing beyond the
    * two relations.
    */
  val qSqlPpr = QueryDef(
    "q_sql_ppr",
    (s, dir) => {
      GraphQueries.undirectedEdges(s, dir)
        .createOrReplaceTempView("fulfillment_edges_v")
      GraphQueries.seedNodes(s, dir)
        .createOrReplaceTempView("fulfillment_seeds_v")
      s.sql(s"""
        SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
                 AS node_type,
               node DIV 2 AS node_key, pr
        FROM ppr('fulfillment_edges_v', 'src', 'dst',
                 'fulfillment_seeds_v', 'node', ${GraphQueries.Iters})
        ORDER BY node_type, node_key""")
    },
    Some(GraphQueries.pprOracle))

  val all: Seq[QueryDef] =
    Seq(qSqlGlobalRank, qSqlGroupedQuantiles, qSqlPagerank, qSqlComponents,
      qSqlPpr)
}
