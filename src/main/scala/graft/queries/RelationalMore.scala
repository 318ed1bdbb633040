package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.Tables.t
import graft.queries.QueryDef.dec

/** Classic TPC-H join/aggregate shapes beyond q1/q3/q5 — the relational
  * patterns a warehouse user actually reuses (volume shipping between
  * two markets, returned-item ranking, customer distribution, promo
  * share, large-volume orders, multi-branch OR predicates). The
  * remaining 13 shapes live in `TpchFull` (column adaptations noted
  * there), completing the 22-query suite. Exact-decimal money
  * discipline throughout (QueryDef scaladoc).
  */
object RelationalMore {

  private def revenue = (dec(col("l_extendedprice")) *
    (lit(BigDecimal(1)) - dec(col("l_discount"))).cast("decimal(4,2)"))
    .cast("decimal(18,4)")

  private val revenueSql =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
       CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
       AS DECIMAL(18,4))"""

  /** TPC-H Q7 shape: bilateral shipping volume between two nations per
    * year. Two broadcast nation lookups with DIFFERENT aliases feeding
    * supplier and customer sides; the OR'd nation-pair predicate prunes
    * after both resolve. One shuffle join on l_orderkey=o_orderkey; all
    * dims broadcast.
    */
  val q7VolumeShipping = QueryDef(
    "q7_volume_shipping",
    (s, dir) => {
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1995-01-01 00:00:00").cast("timestamp"),
          lit("1996-12-31 00:00:00").cast("timestamp")))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("bigint").as("l_year"))
        .agg(sum(revenue).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some(s"""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(SUM($revenueSql) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
             (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** TPC-H Q10 shape: customers ranked by revenue lost to returned
    * items in one half-year. Fact-side filters (returnflag, date) push
    * to the scans; customer+nation broadcast; top-20 with a full
    * deterministic tiebreak.
    */
  val q10ReturnedItems = QueryDef(
    "q10_returned_items",
    (s, dir) => t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20),
    Some(s"""
      SELECT c_custkey, c_name, c_acctbal, n_name,
             CAST(SUM($revenueSql) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY 1, 2, 3, 4
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** TPC-H Q13 shape: distribution of orders-per-customer, zero bucket
    * included via the LEFT join (the one shape an inner join silently
    * gets wrong). Two cascaded aggregations, both on shuffle keys.
    */
  val q13OrderDistribution = QueryDef(
    "q13_order_distribution",
    (s, dir) => t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc),
    Some("""
      SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H Q14 shape: promo revenue share — a conditional aggregate
    * ratio. Numerator and denominator stay exact decimals through the
    * aggregate; the single division happens once in double (identical
    * IEEE result on both engines).
    */
  val q14PromoShare = QueryDef(
    "q14_promo_share",
    (s, dir) => t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenue)
          .otherwise(lit(BigDecimal(0)).cast("decimal(18,4)"))).as("promo"),
        sum(revenue).as("total"))
      .select(
        (col("promo").cast("double") * 100 / col("total").cast("double"))
          .as("promo_pct"),
        col("promo").cast("double").as("promo_revenue"),
        col("total").cast("double").as("total_revenue")),
    Some(s"""
      SELECT CAST(promo AS DOUBLE) * 100 / CAST(total AS DOUBLE) AS promo_pct,
             CAST(promo AS DOUBLE) AS promo_revenue,
             CAST(total AS DOUBLE) AS total_revenue
      FROM (SELECT
              SUM(CASE WHEN p_type = 'PROMO' THEN $revenueSql
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS promo,
              SUM($revenueSql) AS total
            FROM lineitem JOIN part ON l_partkey = p_partkey)"""))

  /** TPC-H Q18 shape: large-volume orders — a grouped HAVING feeding a
    * join back to the order/customer detail. The quantity sum stays in
    * exact decimal for the threshold comparison.
    */
  val q18LargeVolume = QueryDef(
    "q18_large_volume",
    (s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("sum_qty").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    },
    Some("""
      SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
             CAST(sum_qty AS DOUBLE) AS sum_qty
      FROM (SELECT l_orderkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 300)
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey"""))

  /** TPC-H Q19 shape: three OR'd (brand, size-range, quantity-range)
    * branches over the part join — the disjunctive-predicate pattern
    * that exercises CNF conversion and partial pushdown.
    */
  val q19DiscountedRevenue = QueryDef(
    "q19_discounted_revenue",
    (s, dir) => t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(1, 15) &&
          col("l_quantity").between(5, 30)) ||
        (col("p_brand") === "Brand#20" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 40)))
      .agg(count(lit(1)).as("n_items"),
        sum(revenue).cast("double").as("revenue")),
    Some(s"""
      SELECT count(*) AS n_items, CAST(SUM($revenueSql) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 5 AND 30)
         OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 40)"""))

  val all: Seq[QueryDef] = Seq(q7VolumeShipping, q10ReturnedItems,
    q13OrderDistribution, q14PromoShare, q18LargeVolume, q19DiscountedRevenue)
}
