package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{SessionKeyedCache, Tables}

/** The name-based SQL surface of the warehouse (`graft.catalog
  * .GraftCatalog`): every verb a SQL-only client needs — CREATE
  * NAMESPACE / CREATE TABLE / INSERT INTO / DELETE FROM / SELECT /
  * VERSION AS OF — executed as `spark.sql` text against a registered
  * catalog, and hash-gated against a DuckDB oracle computing the same
  * result straight from `orders`. The reference's BI story is
  * name-based SQL over Postgres (`README.md:65-67`); these queries
  * prove the lakehouse layer answers the same way, with the manifest's
  * snapshot isolation and stats skipping underneath.
  */
object CatalogQueries {

  private val catOnce = new SessionKeyedCache[String]

  /** Register the catalog once per session and run the DDL/DML fixture
    * once per (session, sfDir): CREATE TABLE pins the schema over an
    * empty snapshot (v1), INSERT INTO lands one manifest-committed
    * append (v2), DELETE FROM rewrites only the touched files (v3).
    * Returns the catalog-qualified table name.
    */
  private def fixture(s: SparkSession, dir: String): String =
    catOnce.getOrElseUpdate(s, s"cat:$dir",
      SessionKeyedCache.fileFingerprint(s, s"$dir/orders.parquet"))({
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_cat_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      s.conf.set("spark.sql.catalog.graftwh", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graftwh.root", root)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graftwh.marts")
      s.sql("""CREATE TABLE graftwh.marts.ord_slice (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING)""")
      Tables.t(s, dir, "orders")
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("bigint").as("price_cents"),
          col("o_orderpriority").as("pri"))
        .createOrReplaceTempView("__cat_src")
      s.sql("""INSERT INTO graftwh.marts.ord_slice
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      s.sql("""DELETE FROM graftwh.marts.ord_slice
               WHERE pri = '1-URGENT' AND o_orderkey < 1000""")
      // second table: the SQL UPDATE + MERGE INTO round trip (round 13)
      s.sql("""CREATE TABLE graftwh.marts.ord_upd (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING)""")
      s.sql("""INSERT INTO graftwh.marts.ord_upd
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      s.sql("""UPDATE graftwh.marts.ord_upd
               SET price_cents = price_cents + 7 WHERE pri = '5-LOW'""")
      Tables.t(s, dir, "orders")
        .filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"),
          (floor(col("o_totalprice") * 100).cast("bigint") * 2 + 1)
            .as("price_cents"),
          col("o_orderpriority").as("pri"))
        .createOrReplaceTempView("__cat_merge_src")
      s.sql("""MERGE INTO graftwh.marts.ord_upd t
               USING __cat_merge_src s ON t.o_orderkey = s.o_orderkey
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""")
      // round 14: CTAS, INSERT OVERWRITE, generalized merge
      s.sql("""CREATE TABLE graftwh.marts.ord_ctas AS
               SELECT o_orderkey, price_cents, pri FROM __cat_src
               WHERE pri <> '5-LOW'""")
      s.sql("""INSERT OVERWRITE graftwh.marts.ord_ctas
               SELECT o_orderkey, price_cents * 3, pri FROM __cat_src
               WHERE o_orderkey % 2 = 0""")
      s.sql("""CREATE TABLE graftwh.marts.ord_gm (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING)""")
      s.sql("""INSERT INTO graftwh.marts.ord_gm
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      s.sql("""MERGE INTO graftwh.marts.ord_gm t
               USING __cat_merge_src s ON t.o_orderkey = s.o_orderkey
               WHEN MATCHED AND t.pri = '1-URGENT' THEN DELETE
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED AND s.pri = '3-MEDIUM' THEN INSERT *""")
      // round 15: column-level SET assignments (expressions over BOTH
      // sides of the match) …
      s.sql("""CREATE TABLE graftwh.marts.ord_ma (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING)""")
      s.sql("""INSERT INTO graftwh.marts.ord_ma
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      s.sql("""MERGE INTO graftwh.marts.ord_ma t
               USING __cat_merge_src s ON t.o_orderkey = s.o_orderkey
               WHEN MATCHED AND t.pri = '1-URGENT'
                 THEN UPDATE SET price_cents = t.price_cents + s.price_cents
               WHEN MATCHED
                 THEN UPDATE SET price_cents = s.price_cents - t.price_cents,
                                 pri = 'X-MERGED'
               WHEN NOT MATCHED AND s.pri = '2-HIGH' THEN INSERT *""")
      // round 15: the FULL merge program — WHEN NOT MATCHED BY SOURCE
      // UPDATE/DELETE (target-only clauses, whole-table rewrite scope)
      // and a column-level INSERT (cols) VALUES (exprs)
      s.sql("""CREATE TABLE graftwh.marts.ord_fullm (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING)""")
      s.sql("""INSERT INTO graftwh.marts.ord_fullm
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      s.sql("""MERGE INTO graftwh.marts.ord_fullm t
               USING __cat_merge_src s ON t.o_orderkey = s.o_orderkey
               WHEN MATCHED AND t.pri = '1-URGENT'
                 THEN UPDATE SET price_cents = t.price_cents + s.price_cents
               WHEN NOT MATCHED AND s.pri <> '5-LOW'
                 THEN INSERT (o_orderkey, price_cents, pri)
                      VALUES (s.o_orderkey, s.price_cents * 10, 'N-NEW')
               WHEN NOT MATCHED BY SOURCE AND t.pri = '5-LOW' THEN DELETE
               WHEN NOT MATCHED BY SOURCE AND t.pri = '2-HIGH'
                 THEN UPDATE SET price_cents = t.price_cents * 2,
                                 pri = 'S-STALE'""")
      // … and a generalized MERGE straight into a freshly created EMPTY
      // shell (ADVICE r14 medium: matched clauses can't fire, the
      // conditional insert lands via the expected-empty commit)
      s.sql("""CREATE TABLE graftwh.marts.ord_shell (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING)""")
      s.sql("""MERGE INTO graftwh.marts.ord_shell t
               USING __cat_merge_src s ON t.o_orderkey = s.o_orderkey
               WHEN MATCHED THEN DELETE
               WHEN NOT MATCHED AND s.pri <> '5-LOW' THEN INSERT *""")
      // round 15: uncorrelated subqueries in DML predicates — the
      // idiomatic Postgres `DELETE … WHERE k IN (SELECT …)` and a
      // scalar-subquery UPDATE value
      s.sql("""CREATE TABLE graftwh.marts.ord_del AS
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      s.sql("""DELETE FROM graftwh.marts.ord_del
               WHERE o_orderkey IN (SELECT o_orderkey FROM __cat_merge_src
                                    WHERE pri = '1-URGENT')""")
      s.sql("""UPDATE graftwh.marts.ord_del
               SET price_cents = price_cents +
                 (SELECT min(price_cents) FROM __cat_merge_src)
               WHERE pri = '5-LOW'""")
      // round 16: DYNAMIC partition overwrite — the staged partitions
      // (URGENT and MEDIUM here) replace wholesale, the other three
      // survive; mode restored so the rest of the fixture (and any
      // other fixture in the session) keeps static semantics
      s.sql("""CREATE TABLE graftwh.marts.ord_dyn (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING)
               PARTITIONED BY (pri)""")
      s.sql("""INSERT INTO graftwh.marts.ord_dyn
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      val prevMode = s.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try s.sql("""INSERT OVERWRITE graftwh.marts.ord_dyn
                   SELECT o_orderkey, price_cents * 5, pri
                   FROM __cat_merge_src
                   WHERE pri IN ('1-URGENT', '3-MEDIUM')""")
      finally s.conf.set(
        "spark.sql.sources.partitionOverwriteMode", prevMode)
      // round 16: CORRELATED EXISTS / NOT EXISTS in DML predicates —
      // the idiomatic Postgres shapes, decorrelated to a null-safe
      // membership test (plans.GraftDmlSubqueries.decorrelateExists)
      s.sql("""CREATE TABLE graftwh.marts.ord_dex AS
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      s.sql("""DELETE FROM graftwh.marts.ord_dex t
               WHERE EXISTS (SELECT 1 FROM __cat_merge_src s
                             WHERE s.o_orderkey = t.o_orderkey
                               AND s.pri <> '5-LOW')""")
      s.sql("""UPDATE graftwh.marts.ord_dex t
               SET price_cents = price_cents + 11
               WHERE NOT EXISTS (SELECT 1 FROM __cat_merge_src s
                                 WHERE s.o_orderkey = t.o_orderkey)""")
      // round 17: DISTRIBUTED membership — the same EXISTS / NOT
      // EXISTS / IN statements with the literal caps forced below the
      // key-set size, so they route through the membership-join
      // fallback (plans.GraftDmlSubqueries.prepare →
      // Upsert.MembershipJoin) instead of driver literals; the caps are
      // restored so the rest of the fixture keeps the literal fast path
      val prevMaxKeys = s.conf.getOption("spark.graft.dml.exists.maxKeys")
      val prevMaxRows = s.conf.getOption("spark.graft.dml.subquery.maxRows")
      s.conf.set("spark.graft.dml.exists.maxKeys", "3")
      s.conf.set("spark.graft.dml.subquery.maxRows", "3")
      try {
        s.sql("""CREATE TABLE graftwh.marts.ord_dexb AS
                 SELECT o_orderkey, price_cents, pri FROM __cat_src""")
        s.sql("""DELETE FROM graftwh.marts.ord_dexb t
                 WHERE EXISTS (SELECT 1 FROM __cat_merge_src s
                               WHERE s.o_orderkey = t.o_orderkey
                                 AND s.pri <> '5-LOW')""")
        s.sql("""UPDATE graftwh.marts.ord_dexb t
                 SET price_cents = price_cents + 11
                 WHERE NOT EXISTS (SELECT 1 FROM __cat_merge_src s
                                   WHERE s.o_orderkey = t.o_orderkey)""")
        s.sql("""DELETE FROM graftwh.marts.ord_dexb
                 WHERE o_orderkey IN (SELECT o_orderkey
                                      FROM __cat_merge_src
                                      WHERE pri = '5-LOW')""")
      } finally {
        def restore(key: String, v: Option[String]): Unit =
          v.fold(s.conf.unset(key))(s.conf.set(key, _))
        restore("spark.graft.dml.exists.maxKeys", prevMaxKeys)
        restore("spark.graft.dml.subquery.maxRows", prevMaxRows)
      }
      // round 17: REPLACE WHERE — expression-scoped overwrite: the
      // URGENT region is deleted-by-predicate and recomputed rows land
      // in the SAME snapshot commit (writeTo().overwrite(pred) →
      // Upsert.replaceWhere; the leak check pins staged ⊆ region)
      s.sql("""CREATE TABLE graftwh.marts.ord_rw (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING)""")
      s.sql("""INSERT INTO graftwh.marts.ord_rw
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      Tables.t(s, dir, "orders")
        .filter(col("o_orderkey") % 5 === 0 &&
          col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"),
          (floor(col("o_totalprice") * 100).cast("bigint") * 3)
            .as("price_cents"),
          col("o_orderpriority").as("pri"))
        .writeTo("graftwh.marts.ord_rw")
        .overwrite(col("pri") === "1-URGENT")
      // round 17: a PERSISTED VIEW over the maintained mart — the BI
      // artifact the reference's DM layer exists to feed; CREATE OR
      // REPLACE proves the swap is the definition actually served
      s.sql("""CREATE VIEW graftwh.marts.v_priority AS
               SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_upd GROUP BY pri""")
      s.sql("""CREATE OR REPLACE VIEW graftwh.marts.v_priority AS
               SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents,
                      CAST(min(price_cents) AS BIGINT) AS min_cents
               FROM graftwh.marts.ord_upd GROUP BY pri""")
      // round 17: MERGE-ON-READ DML — the table property routes every
      // DELETE/UPDATE through deletion-vector commits
      // (Upsert.deleteWhereMor/updateWhereMor): no data file is ever
      // rewritten; SQL reads anti-join the recorded positions
      // (plans.ApplyDeletionVectors). Exercises both SQL routes
      // (subquery-free DELETE = SupportsDeleteV2, subquery DELETE =
      // GraftDeleteCommand), STACKED deletes on the same files
      // (pointer re-point + position-set merge), and an UPDATE whose
      // new images append beside the DV'd old ones in one commit.
      s.sql("""CREATE TABLE graftwh.marts.ord_mor (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING)
               TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')""")
      s.sql("""INSERT INTO graftwh.marts.ord_mor
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      s.sql("""DELETE FROM graftwh.marts.ord_mor
               WHERE pri = '2-HIGH' AND o_orderkey % 3 = 0""")
      s.sql("""DELETE FROM graftwh.marts.ord_mor
               WHERE pri = '2-HIGH' AND o_orderkey % 3 = 1""")
      s.sql("""DELETE FROM graftwh.marts.ord_mor
               WHERE pri = '3-MEDIUM' AND o_orderkey IN
                 (SELECT o_orderkey FROM __cat_merge_src)""")
      s.sql("""UPDATE graftwh.marts.ord_mor
               SET price_cents = price_cents * 2 + 5
               WHERE pri = '5-LOW' AND o_orderkey % 2 = 0""")
      // … and the ABSORB: a second merge-on-read table compacted after
      // its DVs accumulate — compaction reads DV-applied rows and
      // lands clean files, retiring every pointer in one commit
      s.sql("""CREATE TABLE graftwh.marts.ord_morc (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING)
               TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')""")
      s.sql("""INSERT INTO graftwh.marts.ord_morc
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      s.sql("""DELETE FROM graftwh.marts.ord_morc
               WHERE pri = '1-URGENT' AND o_orderkey % 2 = 1""")
      s.sql("""UPDATE graftwh.marts.ord_morc
               SET pri = 'X-MOR' WHERE pri = '4-NOT SPECIFIED'""")
      s.sql("CALL graftwh.system.compact('marts.ord_morc')")
      // round 18: merge-on-read MERGE — the matched clauses commit DV
      // pointers + appended new images instead of rewriting matched
      // files; a stacked MoR DELETE afterwards re-points the same
      // files (the old-object merge path, post-ADVICE-r17 filter)
      s.sql("""CREATE TABLE graftwh.marts.ord_mmor (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING)
               TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')""")
      s.sql("""INSERT INTO graftwh.marts.ord_mmor
               SELECT o_orderkey, price_cents, pri FROM __cat_src""")
      s.sql("""MERGE INTO graftwh.marts.ord_mmor t
               USING __cat_merge_src s ON t.o_orderkey = s.o_orderkey
               WHEN MATCHED AND t.pri = '1-URGENT' THEN DELETE
               WHEN MATCHED
                 THEN UPDATE SET price_cents = s.price_cents - t.price_cents,
                                 pri = 'X-MORM'
               WHEN NOT MATCHED AND s.pri = '3-MEDIUM' THEN INSERT *""")
      s.sql("""DELETE FROM graftwh.marts.ord_mmor
               WHERE pri = 'X-MORM' AND o_orderkey % 2 = 0""")
      // round 18: SQL materialized view — identity-partitioned source,
      // CREATE materializes, a second insert makes the mart stale, and
      // REFRESH brings the bookmark to the source's current version so
      // the auto-rewrite answers definition-shaped queries from it
      s.sql("""CREATE TABLE graftwh.marts.ord_mvsrc (
                 o_orderkey BIGINT, price_cents BIGINT, pri STRING,
                 d INT)
               PARTITIONED BY (d)""")
      Tables.t(s, dir, "orders")
        .filter(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("bigint").as("price_cents"),
          col("o_orderpriority").as("pri"),
          year(col("o_orderdate")).as("d"))
        .createOrReplaceTempView("__cat_mv_src")
      s.sql("""INSERT INTO graftwh.marts.ord_mvsrc
               SELECT o_orderkey, price_cents, pri, d FROM __cat_mv_src
               WHERE o_orderkey % 2 = 0""")
      s.sql("""CREATE MATERIALIZED VIEW graftwh.marts.mv_pri AS
               SELECT d, pri, count(*) AS n, sum(price_cents) AS cents
               FROM graftwh.marts.ord_mvsrc GROUP BY d, pri""")
      s.sql("""INSERT INTO graftwh.marts.ord_mvsrc
               SELECT o_orderkey, price_cents, pri, d FROM __cat_mv_src
               WHERE o_orderkey % 2 = 1""")
      s.sql("REFRESH MATERIALIZED VIEW graftwh.marts.mv_pri")
      // round 15: ALTER COLUMN TYPE widening — INT files live under a
      // BIGINT pinned schema (Spark's parquet widening promotion), the
      // post-widen insert lands values that overflow INT
      s.sql("""CREATE TABLE graftwh.marts.ord_w (
                 o_orderkey BIGINT, price_cents INT, pri STRING)""")
      s.sql("""INSERT INTO graftwh.marts.ord_w
               SELECT o_orderkey, CAST(price_cents AS INT), pri
               FROM __cat_src""")
      s.sql("""ALTER TABLE graftwh.marts.ord_w
               ALTER COLUMN price_cents TYPE BIGINT""")
      s.sql("""INSERT INTO graftwh.marts.ord_w
               SELECT o_orderkey, price_cents * 100000, pri
               FROM __cat_merge_src""")
      // round 15: HIDDEN partition transforms — months(od) + bucket(8,
      // key) lay out `ptx_*` dirs the logical schema never shows
      Tables.t(s, dir, "orders")
        .filter(col("o_orderkey") % 3 === 1)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("bigint").as("price_cents"),
          col("o_orderdate").as("od"),
          col("o_orderpriority").as("pri"))
        .createOrReplaceTempView("__cat_hp_src")
      s.sql("""CREATE TABLE graftwh.marts.ord_hp (
                 o_orderkey BIGINT, price_cents BIGINT, od DATE,
                 pri STRING)
               PARTITIONED BY (months(od), bucket(8, o_orderkey))""")
      s.sql("""INSERT INTO graftwh.marts.ord_hp (o_orderkey, price_cents,
                 od, pri)
               SELECT o_orderkey, price_cents, od, pri
               FROM __cat_hp_src""")
      // round 15: TWO-LEVEL identity layout (the reference's own chart
      // key shape, ddl_ods.sql:21-23) — partitioned CTAS, then a SQL
      // merge routed through the generalized touched-files rewrite
      Tables.t(s, dir, "orders")
        .filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100).cast("bigint").as("price_cents"),
          date_trunc("year", col("o_orderdate")).cast("date").as("d"),
          col("o_orderpriority").as("pri"))
        .createOrReplaceTempView("__cat_2lvl_src")
      Tables.t(s, dir, "orders")
        .filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"),
          (floor(col("o_totalprice") * 100).cast("bigint") * 2 + 1)
            .as("price_cents"),
          date_trunc("year", col("o_orderdate")).cast("date").as("d"),
          col("o_orderpriority").as("pri"))
        .createOrReplaceTempView("__cat_2lvl_merge")
      s.sql("""CREATE TABLE graftwh.marts.ord_2lvl PARTITIONED BY (d, pri)
               AS SELECT o_orderkey, price_cents, d, pri
                  FROM __cat_2lvl_src""")
      s.sql("""MERGE INTO graftwh.marts.ord_2lvl t
               USING __cat_2lvl_merge s ON t.o_orderkey = s.o_orderkey
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *""")
      "graftwh.marts.ord_slice"
    })

  /** CREATE TABLE → INSERT INTO → DELETE FROM → SELECT, all through
    * SQL text against the catalog; the oracle restates insert+delete
    * as a filter over `orders`. Exercises the V1-write append path,
    * the V2 predicate → Column DELETE translation, and the
    * manifest-resolved read.
    */
  val qSqlCatalog = QueryDef(
    "q_sql_catalog",
    (s, dir) => {
      val tbl = fixture(s, dir)
      s.sql(s"""SELECT pri, count(*) AS n,
                       CAST(sum(price_cents) AS BIGINT) AS cents
                FROM $tbl GROUP BY pri ORDER BY pri""")
    },
    Some("""
      SELECT o_orderpriority AS pri, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders
      WHERE o_orderkey % 7 = 0
        AND NOT (o_orderpriority = '1-URGENT' AND o_orderkey < 1000)
      GROUP BY 1 ORDER BY 1"""))

  /** SQL time travel: `VERSION AS OF 2` is the post-insert, pre-delete
    * snapshot — the deleted rows must still be there, priced exactly.
    * Proves the catalog pins the OLD snapshot's file list and schema,
    * not the current one.
    */
  val qSqlCatalogTravel = QueryDef(
    "q_sql_catalog_travel",
    (s, dir) => {
      val tbl = fixture(s, dir)
      s.sql(s"""SELECT count(*) AS n,
                       CAST(sum(price_cents) AS BIGINT) AS cents
                FROM $tbl VERSION AS OF 2""")
    },
    Some("""
      SELECT count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders WHERE o_orderkey % 7 = 0"""))

  /** SQL `UPDATE` then `MERGE INTO` (SCD1: matched keys replaced,
    * unmatched inserted, survivors untouched), both through catalog
    * SQL text ([[graft.plans.RewriteGraftDml]] → the engine's
    * snapshot-committing rewrite/merge verbs); the oracle restates all
    * three DML statements as set algebra over `orders`. The reference's
    * equivalent is Postgres UPDATE + `INSERT … ON CONFLICT DO UPDATE`
    * (`transformed_from_s3_to_pg.py:143-152`).
    */
  val qSqlUpdateMerge = QueryDef(
    "q_sql_update_merge",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_upd GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (
        SELECT k, pc + CASE WHEN pri = '5-LOW' THEN 7 ELSE 0 END AS pc, pri
        FROM base WHERE k % 7 = 0),
      s5 AS (SELECT k, pc * 2 + 1 AS pc, pri FROM base WHERE k % 5 = 0),
      fin AS (
        SELECT * FROM s5
        UNION ALL
        SELECT * FROM t7 WHERE k NOT IN (SELECT k FROM s5))
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** `CREATE TABLE AS SELECT` then `INSERT OVERWRITE` (round 14): the
    * CTAS result is wholly replaced by the overwrite's SELECT in one
    * snapshot commit — the oracle restates only the overwrite (the CTAS
    * rows must be gone; any survivor breaks the hash).
    */
  val qSqlCtasOverwrite = QueryDef(
    "q_sql_ctas_overwrite",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_ctas GROUP BY pri ORDER BY pri""")
    },
    Some("""
      SELECT o_orderpriority AS pri, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT) * 3)
               AS BIGINT) AS cents
      FROM orders
      WHERE o_orderkey % 7 = 0 AND o_orderkey % 2 = 0
      GROUP BY 1 ORDER BY 1"""))

  /** Generalized `MERGE INTO` (round 14): ordered conditional clauses —
    * matched URGENT rows DELETE, other matches UPDATE SET *, unmatched
    * source rows INSERT only when MEDIUM. The oracle restates the
    * first-match-wins algebra over `orders`.
    */
  val qSqlMergeActions = QueryDef(
    "q_sql_merge_actions",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_gm GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (SELECT k, pc, pri FROM base WHERE k % 7 = 0),
      s5 AS (SELECT k, pc * 2 + 1 AS pc, pri FROM base WHERE k % 5 = 0),
      fin AS (
        -- unmatched target rows survive unchanged
        SELECT k, pc, pri FROM t7 WHERE k NOT IN (SELECT k FROM s5)
        UNION ALL
        -- matched, first clause (t.pri URGENT -> DELETE) not taken:
        -- second clause updates to the source row
        SELECT s.k, s.pc, s.pri FROM s5 s JOIN t7 t ON s.k = t.k
        WHERE t.pri <> '1-URGENT'
        UNION ALL
        -- unmatched source rows insert only under the clause condition
        SELECT k, pc, pri FROM s5
        WHERE k NOT IN (SELECT k FROM t7) AND pri = '3-MEDIUM')
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** Column-level `UPDATE SET col = expr, …` MERGE clauses (round 15):
    * the first clause adds the source price into the target's (URGENT
    * matches), the second REPLACES the price with the source-minus-
    * target difference and re-tags the row — expressions over both
    * sides of the match, applied first-match-wins; unmatched HIGH
    * source rows insert. The oracle restates the assignment algebra.
    */
  val qSqlMergeAssign = QueryDef(
    "q_sql_merge_assign",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_ma GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (SELECT k, pc, pri FROM base WHERE k % 7 = 0),
      s5 AS (SELECT k, pc * 2 + 1 AS pc, pri FROM base WHERE k % 5 = 0),
      fin AS (
        -- unmatched target rows survive unchanged
        SELECT k, pc, pri FROM t7 WHERE k NOT IN (SELECT k FROM s5)
        UNION ALL
        -- first clause: URGENT target -> price accumulates the source's
        SELECT t.k, t.pc + s.pc AS pc, t.pri
        FROM t7 t JOIN s5 s ON t.k = s.k WHERE t.pri = '1-URGENT'
        UNION ALL
        -- second clause: source-minus-target price, re-tagged
        SELECT t.k, s.pc - t.pc AS pc, 'X-MERGED' AS pri
        FROM t7 t JOIN s5 s ON t.k = s.k WHERE t.pri <> '1-URGENT'
        UNION ALL
        -- unmatched source rows insert only when HIGH
        SELECT k, pc, pri FROM s5
        WHERE k NOT IN (SELECT k FROM t7) AND pri = '2-HIGH')
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** `ALTER TABLE … ALTER COLUMN … TYPE BIGINT` (round 15): a
    * metadata-only lossless widening. The first insert lands INT32
    * parquet files; after the widen, a second insert lands values that
    * OVERFLOW Int32 — both file generations aggregate under the one
    * pinned BIGINT schema (Spark 4 parquet widening promotion), with
    * min spanning the narrow generation and max the wide one. The
    * oracle computes the same union from `orders` arithmetic.
    */
  val qSqlWiden = QueryDef(
    "q_sql_widen",
    (s, dir) => {
      fixture(s, dir)
      val shape = s.table("graftwh.marts.ord_w").schema("price_cents")
      require(shape.dataType ==
        org.apache.spark.sql.types.LongType,
        s"widen fixture: price_cents must read as BIGINT, got $shape")
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents,
                      CAST(min(price_cents) AS BIGINT) AS min_c,
                      CAST(max(price_cents) AS BIGINT) AS max_c
               FROM graftwh.marts.ord_w GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      u AS (
        SELECT pri, pc FROM base WHERE k % 7 = 0
        UNION ALL
        SELECT pri, (pc * 2 + 1) * 100000 AS pc FROM base WHERE k % 5 = 0)
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents,
             CAST(min(pc) AS BIGINT) AS min_c,
             CAST(max(pc) AS BIGINT) AS max_c
      FROM u GROUP BY 1 ORDER BY 1"""))

  /** Hidden partition transforms (round 15): `PARTITIONED BY
    * (months(od), bucket(8, o_orderkey))` clusters writes under
    * engine-maintained `ptx_*` directories that never surface in the
    * logical schema; a month-range predicate on the SOURCE column
    * prunes the snapshot's file list before any footer is opened
    * (HiddenPartitionSpec pins the pruning + hiding; this query pins
    * the VALUES: the layout round-trip must be lossless, including
    * rows whose month sits at the range edges). The oracle computes
    * the same filtered aggregate straight from `orders`.
    */
  val qSqlHiddenPart = QueryDef(
    "q_sql_hidden_part",
    (s, dir) => {
      fixture(s, dir)
      val cols = s.table("graftwh.marts.ord_hp").columns.toSeq
      require(!cols.exists(_.startsWith("ptx_")),
        s"hidden layout leaked into the logical schema: $cols")
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_hp
               WHERE od >= DATE'1995-01-01' AND od < DATE'1996-01-01'
               GROUP BY pri ORDER BY pri""")
    },
    Some("""
      SELECT o_orderpriority AS pri, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders
      WHERE o_orderkey % 3 = 1
        AND o_orderdate >= DATE '1995-01-01'
        AND o_orderdate < DATE '1996-01-01'
      GROUP BY 1 ORDER BY 1"""))

  /** The FULL merge program in one SQL statement (round 15):
    * conditional column-level matched UPDATE, column-level `INSERT
    * (cols) VALUES (exprs)` (keys identity-assigned from the source, a
    * computed price, a literal tag), and `WHEN NOT MATCHED BY SOURCE`
    * DELETE + UPDATE over target rows the source does not name. The
    * oracle partitions the key space the same way: matched (k in both
    * slices), source-only (insert), target-only (by-source clauses,
    * first-match-wins).
    */
  val qSqlMergeFull = QueryDef(
    "q_sql_merge_full",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_fullm GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (SELECT k, pc, pri FROM base WHERE k % 7 = 0),
      s5 AS (SELECT k, pc * 2 + 1 AS pc, pri FROM base WHERE k % 5 = 0),
      fin AS (
        -- matched, first clause: URGENT accumulates the source's price
        SELECT t.k, t.pc + s.pc AS pc, t.pri
        FROM t7 t JOIN s5 s ON t.k = s.k WHERE t.pri = '1-URGENT'
        UNION ALL
        -- matched, no clause fires: unchanged
        SELECT t.k, t.pc, t.pri
        FROM t7 t JOIN s5 s ON t.k = s.k WHERE t.pri <> '1-URGENT'
        UNION ALL
        -- source-only rows insert with a computed price and a tag
        SELECT s.k, s.pc * 10 AS pc, 'N-NEW' AS pri
        FROM s5 s
        WHERE s.k NOT IN (SELECT k FROM t7) AND s.pri <> '5-LOW'
        UNION ALL
        -- target-only: 5-LOW deleted; 2-HIGH re-priced and re-tagged
        SELECT t.k, t.pc * 2 AS pc, 'S-STALE' AS pri
        FROM t7 t
        WHERE t.k NOT IN (SELECT k FROM s5) AND t.pri = '2-HIGH'
        UNION ALL
        -- target-only survivors: no by-source clause fires
        SELECT t.k, t.pc, t.pri
        FROM t7 t
        WHERE t.k NOT IN (SELECT k FROM s5)
          AND t.pri NOT IN ('5-LOW', '2-HIGH'))
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** Generalized MERGE into a freshly CREATE TABLE'd EMPTY shell
    * (round 15; ADVICE r14 medium): no row can match, so the DELETE
    * clause is a no-op and every source row passing the insert
    * condition lands — through the expected-empty whole-table commit,
    * not a blind append. The oracle is just the conditioned source.
    */
  val qSqlMergeShell = QueryDef(
    "q_sql_merge_shell",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_shell GROUP BY pri ORDER BY pri""")
    },
    Some("""
      SELECT o_orderpriority AS pri, count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT) * 2 + 1)
               AS BIGINT) AS cents
      FROM orders
      WHERE o_orderkey % 5 = 0 AND o_orderpriority <> '5-LOW'
      GROUP BY 1 ORDER BY 1"""))

  /** Uncorrelated subqueries in DML predicates (round 15): `DELETE …
    * WHERE key IN (SELECT …)` — the Postgres idiom the reference's
    * users write — and an UPDATE whose SET value is a scalar subquery.
    * Both literalize through a bounded materialization
    * ([[graft.plans.RewriteGraftDml]]) and run the touched-files-only
    * snapshot rewrite; the oracle restates both statements inline.
    */
  val qSqlDeleteIn = QueryDef(
    "q_sql_delete_in",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_del GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (SELECT k, pc, pri FROM base WHERE k % 7 = 0),
      s5 AS (SELECT k, pc * 2 + 1 AS pc, pri FROM base WHERE k % 5 = 0),
      kept AS (
        SELECT * FROM t7
        WHERE k NOT IN (SELECT k FROM s5 WHERE pri = '1-URGENT')),
      fin AS (
        SELECT k,
               pc + CASE WHEN pri = '5-LOW'
                         THEN (SELECT min(pc) FROM s5) ELSE 0 END AS pc,
               pri
        FROM kept)
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** Dynamic `INSERT OVERWRITE` (round 16): with
    * `partitionOverwriteMode=dynamic`, the overwrite replaces exactly
    * the partitions present in the SELECT's output — URGENT and
    * MEDIUM here, recomputed ×5 from the merge slice — and leaves the
    * other three untouched, in one snapshot commit
    * ([[graft.plans.GraftDynamicOverwriteCommand]] →
    * `Upsert.overwritePartitions`). The oracle restates it as
    * delete-matching-partitions + insert.
    */
  val qSqlOverwriteDynamic = QueryDef(
    "q_sql_overwrite_dynamic",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_dyn GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (SELECT k, pc, pri FROM base WHERE k % 7 = 0),
      repl AS (SELECT k, (pc * 2 + 1) * 5 AS pc, pri FROM base
               WHERE k % 5 = 0 AND pri IN ('1-URGENT', '3-MEDIUM')),
      fin AS (
        SELECT * FROM t7 WHERE pri NOT IN ('1-URGENT', '3-MEDIUM')
        UNION ALL
        SELECT * FROM repl)
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** Correlated `EXISTS` / `NOT EXISTS` in DML predicates (round 16):
    * the fixture DELETEs rows with a non-LOW match in the merge slice
    * (correlation `s.o_orderkey = t.o_orderkey` plus an uncorrelated
    * residual), then UPDATEs the rows with NO match at all. The oracle
    * restates both as key-set membership — exactly the semi-join the
    * decorrelation performs.
    */
  val qSqlDeleteExists = QueryDef(
    "q_sql_delete_exists",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_dex GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (SELECT k, pc, pri FROM base WHERE k % 7 = 0),
      s5 AS (SELECT k, pri FROM base WHERE k % 5 = 0),
      kept AS (
        SELECT * FROM t7
        WHERE k NOT IN (SELECT k FROM s5 WHERE pri <> '5-LOW')),
      fin AS (
        SELECT k,
               pc + CASE WHEN k IN (SELECT k FROM s5) THEN 0 ELSE 11 END
                 AS pc,
               pri
        FROM kept)
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** REPLACE WHERE (round 17): the expression-scoped overwrite —
    * `writeTo(t).overwrite(pred)` deletes the predicate's region and
    * lands the staged recomputation in ONE snapshot commit
    * ([[graft.engine.Upsert.replaceWhere]]); rows outside the region
    * survive byte-equal. The oracle restates delete-region + insert.
    */
  val qSqlReplaceWhere = QueryDef(
    "q_sql_replace_where",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_rw GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (SELECT k, pc, pri FROM base WHERE k % 7 = 0),
      repl AS (SELECT k, pc * 3 AS pc, pri FROM base
               WHERE k % 5 = 0 AND pri = '1-URGENT'),
      fin AS (
        SELECT * FROM t7 WHERE pri <> '1-URGENT'
        UNION ALL
        SELECT * FROM repl)
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** Persistent SQL views (round 17): `SELECT` through a CREATE OR
    * REPLACE'd view over the merged mart. The view exists only as
    * stored SQL text + its captured resolution context
    * ([[graft.catalog.GraftViews]]); the read re-parses and re-analyzes
    * it against the CURRENT snapshot — so a green hash proves the
    * whole chain: parser interception, catalog persistence, the
    * replace swap (the served definition carries the replace-added
    * `min_cents`), and read-time expansion. The oracle restates the
    * view text inline over the ord_upd algebra.
    */
  val qSqlView = QueryDef(
    "q_sql_view",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, n, cents, min_cents
               FROM graftwh.marts.v_priority ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (
        SELECT k, pc + CASE WHEN pri = '5-LOW' THEN 7 ELSE 0 END AS pc, pri
        FROM base WHERE k % 7 = 0),
      s5 AS (SELECT k, pc * 2 + 1 AS pc, pri FROM base WHERE k % 5 = 0),
      fin AS (
        SELECT * FROM s5
        UNION ALL
        SELECT * FROM t7 WHERE k NOT IN (SELECT k FROM s5))
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents,
             CAST(min(pc) AS BIGINT) AS min_cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** Distributed DML membership (round 17, lifting the key-set
    * ceiling): the same correlated EXISTS / NOT EXISTS / uncorrelated
    * IN statements as [[qSqlDeleteExists]]'s family, but with the
    * literal caps forced to 3 in the fixture so every key set routes
    * through the membership-JOIN fallback — DISTINCT keys + marker
    * left-joined onto both the touched-file discovery scan and the
    * rewrite, nothing collected to the driver. The oracle restates the
    * three statements as key-set membership; matching it proves the
    * join path is value-identical to the literal path it replaces.
    */
  val qSqlDeleteExistsBig = QueryDef(
    "q_sql_delete_exists_big",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_dexb GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (SELECT k, pc, pri FROM base WHERE k % 7 = 0),
      s5 AS (SELECT k, pri FROM base WHERE k % 5 = 0),
      kept AS (
        SELECT * FROM t7
        WHERE k NOT IN (SELECT k FROM s5 WHERE pri <> '5-LOW')),
      upd AS (
        SELECT k,
               pc + CASE WHEN k IN (SELECT k FROM s5) THEN 0 ELSE 11 END
                 AS pc,
               pri
        FROM kept),
      fin AS (
        SELECT * FROM upd
        WHERE k NOT IN (SELECT k FROM s5 WHERE pri = '5-LOW'))
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** Two-level `PARTITIONED BY (d, pri)` layout (round 15): a
    * partitioned CTAS laid the table out as nested `d=…/pri=…`
    * directories, a SQL MERGE maintained it through the generalized
    * touched-files rewrite, and the probe filters the FIRST level (a
    * date range — partition-pruned to those months' leaves) while
    * grouping by the second. The oracle restates CTAS ∪ merge algebra.
    */
  val qSqlTwoLevel = QueryDef(
    "q_sql_two_level",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_2lvl
               WHERE d >= DATE '1997-01-01'
               GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               CAST(date_trunc('year', o_orderdate) AS DATE) AS d,
               o_orderpriority AS pri
        FROM orders),
      t3 AS (SELECT * FROM base WHERE k % 3 = 0),
      m4 AS (SELECT k, pc * 2 + 1 AS pc, d, pri FROM base WHERE k % 4 = 0),
      fin AS (
        SELECT * FROM t3 WHERE k NOT IN (SELECT k FROM m4)
        UNION ALL
        SELECT * FROM m4)
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin WHERE d >= DATE '1997-01-01'
      GROUP BY 1 ORDER BY 1"""))

  /** Merge-on-read DML (round 17): three DELETEs (two stacked on the
    * same files, one through the subquery-command route) and an UPDATE
    * against a `graft.dml.mode=merge-on-read` table — every statement
    * commits deletion-vector pointers, never a rewritten data file,
    * and the SELECT reads through the DV anti-join
    * ([[graft.plans.ApplyDeletionVectors]]). The oracle restates the
    * surviving-row algebra; a green hash proves positions recorded,
    * merged across stacked deletes, and applied at read are exactly
    * the rows the statements matched.
    */
  val qSqlDeleteMor = QueryDef(
    "q_sql_delete_mor",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_mor GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (SELECT k, pc, pri FROM base WHERE k % 7 = 0),
      kept AS (
        SELECT * FROM t7
        WHERE NOT (pri = '2-HIGH' AND (k % 3 = 0 OR k % 3 = 1))
          AND NOT (pri = '3-MEDIUM' AND
                   k IN (SELECT k FROM base WHERE k % 5 = 0))),
      fin AS (
        SELECT k,
               CASE WHEN pri = '5-LOW' AND k % 2 = 0
                    THEN pc * 2 + 5 ELSE pc END AS pc,
               pri
        FROM kept)
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** Deletion-vector ABSORB (round 17): merge-on-read DELETE + UPDATE
    * accumulate DVs, then `CALL system.compact` reads the DV-applied
    * rows and lands clean files — the deferred rewrite. The oracle
    * restates the post-DML state; a green hash proves the absorb is
    * value-exact (CatalogSpec asserts the pointers actually dropped
    * and the files merged).
    */
  val qSqlMorCompact = QueryDef(
    "q_sql_mor_compact",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_morc GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (SELECT k, pc, pri FROM base WHERE k % 7 = 0),
      kept AS (
        SELECT * FROM t7
        WHERE NOT (pri = '1-URGENT' AND k % 2 = 1)),
      fin AS (
        SELECT k, pc,
               CASE WHEN pri = '4-NOT SPECIFIED' THEN 'X-MOR'
                    ELSE pri END AS pri
        FROM kept)
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** Merge-on-read MERGE (round 18): a three-clause MERGE against a
    * `graft.dml.mode=merge-on-read` table — matched DELETE and matched
    * UPDATE commit deletion-vector pointers plus appended new images
    * (never a rewritten matched file), the INSERT clause appends — and
    * a stacked MoR DELETE afterwards re-points the SAME files, driving
    * the old-object merge path (whose rows are filtered to the touched
    * files; ADVICE r17 medium). The oracle restates the full algebra:
    * a green hash proves the DV'd old images, the appended update
    * images, the conditional inserts, and the second delete compose to
    * exactly the SQL MERGE semantics the COW path gives.
    */
  val qSqlMergeMor = QueryDef(
    "q_sql_merge_mor",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT pri, count(*) AS n,
                      CAST(sum(price_cents) AS BIGINT) AS cents
               FROM graftwh.marts.ord_mmor GROUP BY pri ORDER BY pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri
        FROM orders),
      t7 AS (SELECT k, pc, pri FROM base WHERE k % 7 = 0),
      s5 AS (SELECT k, pc * 2 + 1 AS pc, pri FROM base WHERE k % 5 = 0),
      kept AS (SELECT * FROM t7 WHERE k % 5 <> 0),
      upd AS (
        SELECT t7.k, s5.pc - t7.pc AS pc, 'X-MORM' AS pri
        FROM t7 JOIN s5 ON t7.k = s5.k
        WHERE t7.pri <> '1-URGENT' AND t7.k % 2 = 1),
      ins AS (SELECT k, pc, pri FROM s5
              WHERE k % 7 <> 0 AND pri = '3-MEDIUM'),
      fin AS (
        SELECT * FROM kept
        UNION ALL SELECT * FROM upd
        UNION ALL SELECT * FROM ins)
      SELECT pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** SQL materialized view (round 18): `CREATE MATERIALIZED VIEW … AS
    * SELECT` materialized the aggregate, a later source insert made it
    * stale, `REFRESH MATERIALIZED VIEW` ran the bookmark refresh — and
    * this query RESTATES the definition over the SOURCE, so the
    * freshness-gated plan-shape rewrite answers it from the mart
    * (CatalogSpec asserts the scan actually lands on the mart's
    * manifest, and that the stale window falls back to the source).
    * The oracle recomputes from `orders` arithmetic: a green hash
    * proves the SQL-created mart, the refresh, and the rewrite are all
    * semantics-preserving.
    */
  val qSqlMatview = QueryDef(
    "q_sql_matview",
    (s, dir) => {
      fixture(s, dir)
      s.sql("""SELECT d, pri, n, cents FROM (
                 SELECT d, pri, count(*) AS n, sum(price_cents) AS cents
                 FROM graftwh.marts.ord_mvsrc GROUP BY d, pri)
               ORDER BY d, pri""")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS k,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS pc,
               o_orderpriority AS pri,
               CAST(year(o_orderdate) AS INT) AS d
        FROM orders),
      t11 AS (SELECT * FROM base WHERE k % 11 = 0)
      SELECT d, pri, count(*) AS n, CAST(sum(pc) AS BIGINT) AS cents
      FROM t11 GROUP BY d, pri ORDER BY d, pri"""))

  val all: Seq[QueryDef] =
    Seq(qSqlCatalog, qSqlCatalogTravel, qSqlUpdateMerge,
      qSqlCtasOverwrite, qSqlMergeActions, qSqlMergeAssign, qSqlMergeFull,
      qSqlMergeShell, qSqlDeleteIn, qSqlTwoLevel, qSqlWiden,
      qSqlHiddenPart, qSqlOverwriteDynamic, qSqlDeleteExists,
      qSqlDeleteExistsBig, qSqlView, qSqlReplaceWhere, qSqlDeleteMor,
      qSqlMorCompact, qSqlMergeMor, qSqlMatview)
}
