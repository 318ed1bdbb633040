package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables.t
import QueryDef._

/** Core relational operator coverage (SURVEY.md §2) over the driver
  * testdata star schema. Each query maps one or more §2 inventory rows to
  * an idiomatic Catalyst plan: filters/projections push into the parquet
  * scan, small dims are broadcast, aggregates are partial+final hash aggs.
  *
  * Reference citations are per-query; the reference performs these shapes
  * in Postgres SQL or Python loops (e.g. `dags/from_dds_to_dm_pg.py`,
  * `dags/from_ods_to_dds_pg.py`) — here they are single declarative plans.
  */
object Relational {

  /** A5/A6/A7 + P5/P6 + W2 — grouped sum/avg/count with pushed-down date
    * predicate and multi-key ordering (cf. `dags/from_dds_to_dm_pg.py:45-80`).
    * TPC-H Q1-shaped over lineitem; all money math in exact decimal.
    */
  val q1PricingSummary = QueryDef(
    "q1_pricing_summary",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val price = dec(col("l_extendedprice"))
      val omd = (lit(BigDecimal(1)) - dec(col("l_discount"))).cast("decimal(4,2)")
      val opt = (lit(BigDecimal(1)) + dec(col("l_tax"))).cast("decimal(4,2)")
      val discPrice = (price * omd).cast("decimal(18,4)")
      li.filter(col("l_shipdate") <= lit("1999-06-30 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum((discPrice * opt).cast("decimal(24,6)")).cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(col("l_quantity"))).as("avg_qty"),
          (sum(price).cast("double") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4)) * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-06-30 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** J1 (multi-way dim join, broadcast) + A7 + W1 (top-k) — TPC-H Q3-shaped.
    * cf. fact build `dags/from_ods_to_dds_pg.py:88-102`.
    */
  val q3TopRevenue = QueryDef(
    "q3_top_revenue",
    (s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
      val price = dec(col("l_extendedprice"))
      val omd = (lit(BigDecimal(1)) - dec(col("l_discount"))).cast("decimal(4,2)")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum((price * omd).cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderdate, l_orderkey
      LIMIT 10"""))

  /** J1 at its widest — 6-table join through the region→nation→customer→
    * orders→lineitem→supplier chain (TPC-H Q5-shaped), small dims broadcast.
    */
  val q5LocalSupplier = QueryDef(
    "q5_local_supplier",
    (s, dir) => {
      val price = dec(col("l_extendedprice"))
      val omd = (lit(BigDecimal(1)) - dec(col("l_discount"))).cast("decimal(4,2)")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum((price * omd).cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""))

  /** A1/A2 — DISTINCT projection (cf. dim_country/dim_artist candidates,
    * `dags/from_ods_to_dds_pg.py:46-64`).
    */
  val qDistinct = QueryDef(
    "q_distinct",
    (s, dir) => t(s, dir, "customer").select("c_mktsegment").distinct()
      .orderBy("c_mktsegment"),
    Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"))

  /** A3 + W3 — DISTINCT over a composite key with deterministic surrogate
    * ids via row_number over the natural-key order (cf. dim_song composite
    * UNIQUE(song_name, duration_sec), `scripts/ddl_dds.sql:14-19`; surrogate
    * strategy SURVEY §7.4.1).
    */
  val qDimComposite = QueryDef(
    "q_dim_surrogate",
    (s, dir) => graft.star.StarBuilder.withSurrogateId(
      t(s, dir, "part").select("p_brand", "p_type").distinct(),
      "dim_id", Seq("p_brand", "p_type")),
    Some("""
      SELECT row_number() OVER (ORDER BY p_brand, p_type) AS dim_id, p_brand, p_type
      FROM (SELECT DISTINCT p_brand, p_type FROM part)"""))

  /** A4 + P6 + P7 + F1/F2 — scalar-subquery mean imputation, the dim_song
    * zero-duration fix (`dags/from_ods_to_dds_pg.py:72-80`, `README.md:70`).
    * Rounding done in pure integer math (cents) so PG `numeric::int`
    * half-up semantics are reproduced exactly on both engines.
    */
  val qImputeScalar = QueryDef(
    "q_impute_scalar",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val cents = (dec(col("value")) * 100).cast("bigint")
      val avgCents = ev.filter(col("value") >= 10)
        .agg(divRoundHalfUp(sum(cents), count(lit(1))).as("avg_cents"))
      ev.crossJoin(broadcast(avgCents))
        .select(col("event_type"),
          when(col("value") < 10, col("avg_cents").cast("double") / 100)
            .otherwise(dec(col("value")).cast("double")).as("value_filled"))
        .distinct()
        .orderBy(col("event_type"), col("value_filled"))
    },
    Some("""
      WITH a AS (
        SELECT (2 * SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) + COUNT(*)) // (2 * COUNT(*)) AS avg_cents
        FROM events WHERE value >= 10)
      SELECT DISTINCT event_type,
        CASE WHEN value < 10 THEN CAST(a.avg_cents AS DOUBLE) / 100
             ELSE CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) END AS value_filled
      FROM events, a
      ORDER BY event_type, value_filled"""))

  /** J5 — left anti join, the `ON CONFLICT DO NOTHING` idempotency shape
    * (`dags/transformed_from_s3_to_pg.py:146-151`).
    */
  val qAntiJoin = QueryDef(
    "q_anti_join",
    (s, dir) => t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  /** left semi join (EXISTS) — companion of J5. */
  val qSemiJoin = QueryDef(
    "q_semi_join",
    (s, dir) => t(s, dir, "nation")
      .join(t(s, dir, "supplier"), col("n_nationkey") === col("s_nationkey"), "left_semi")
      .select("n_nationkey", "n_name")
      .orderBy("n_nationkey"),
    Some("""
      SELECT n_nationkey, n_name FROM nation
      WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
      ORDER BY n_nationkey"""))

  /** W1 — top-k per group via ranking window (the chart's top-100-per-
    * (country,date) shape, `dags/raw_from_api_to_s3.py:42`).
    */
  val qTopkPerGroup = QueryDef(
    "q_topk_per_group",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    },
    Some("""
      SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders)
      WHERE rk <= 3
      ORDER BY o_custkey, rk"""))

  /** §2.6 — set operation (UNION DISTINCT); absent from the reference,
    * included as extension-surface coverage.
    */
  val qUnion = QueryDef(
    "q_union_distinct",
    (s, dir) => t(s, dir, "customer").select(col("c_mktsegment").as("v"))
      .union(t(s, dir, "orders").select(col("o_orderpriority").as("v")))
      .distinct()
      .orderBy("v"),
    Some("""
      SELECT c_mktsegment AS v FROM customer
      UNION
      SELECT o_orderpriority AS v FROM orders
      ORDER BY v"""))

  /** §2.6 — INTERSECT (distinct semantics), extension coverage. */
  val qIntersect = QueryDef(
    "q_intersect",
    (s, dir) => t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      .intersect(t(s, dir, "customer").select(col("c_nationkey").as("nk")))
      .orderBy("nk"),
    Some("""
      SELECT s_nationkey AS nk FROM supplier
      INTERSECT
      SELECT c_nationkey AS nk FROM customer
      ORDER BY nk"""))

  /** §2.6 — EXCEPT (distinct semantics), extension coverage. */
  val qExcept = QueryDef(
    "q_except",
    (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .except(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
      .orderBy("nk"),
    Some("""
      SELECT c_nationkey AS nk FROM customer
      EXCEPT
      SELECT s_nationkey AS nk FROM supplier
      ORDER BY nk"""))

  /** P1/F8 — semi-structured flatten: JSON field extraction from
    * `events.props` (cf. the raw-JSON flatten,
    * `dags/transformed_from_s3_to_pg.py:31-45`).
    */
  val qJsonExtract = QueryDef(
    "q_json_extract",
    (s, dir) => t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id"),
    Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events ORDER BY event_id"""))

  /** F8 (typed parse) — `from_json` with a declared schema, the
    * schema-first twin of [[qJsonExtract]]'s path extraction (the
    * reference's `json.loads`, `transformed_from_s3_to_pg.py:63`).
    * Aggregating the parsed field proves the struct is fully typed.
    */
  val qFromJson = QueryDef(
    "q_from_json",
    (s, dir) => t(s, dir, "events")
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).as("p"))
      .groupBy(col("event_type"))
      .agg(sum(col("p.k")).as("sum_k"), count(col("p.k")).as("n"))
      .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** P1 — array explode with position (the `tracks.track[]` flatten,
    * `dags/transformed_from_s3_to_pg.py:33-34`) over the embeddings table.
    */
  val qExplode = QueryDef(
    "q_explode_array",
    (s, dir) => t(s, dir, "embeddings")
      .filter(col("vec_id") < 8)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"), col("val"))
      .orderBy("vec_id", "pos"),
    Some("""
      SELECT vec_id, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS val
      FROM embeddings WHERE vec_id < 8
      ORDER BY vec_id, pos"""))

  val all: Seq[QueryDef] = Seq(
    q1PricingSummary, q3TopRevenue, q5LocalSupplier, qDistinct, qDimComposite,
    qImputeScalar, qAntiJoin, qSemiJoin, qTopkPerGroup, qUnion, qIntersect,
    qExcept, qJsonExtract, qFromJson, qExplode)
}
