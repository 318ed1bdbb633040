package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** One user-facing SQL session, end to end (round 15, verdict item 6):
  * everything a warehouse client does goes through SQL TEXT against
  * the registered catalog — CREATE partitioned / CTAS / INSERT /
  * streaming CDC into a replica / MERGE with column-level assignments
  * / subquery DELETE / ALTER TABLE RENAME COLUMN / CALL history /
  * time-travel SELECT — with no DataFrame-API escape hatches for any
  * data operation. The only non-SQL calls are the streaming driver
  * (`changeFeedStreamByName`, which is name-addressed and applies its
  * batches BY SQL) and the assertions.
  */
class SqlSessionE2eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a full SQL-only warehouse session round-trips") {
    val root = Files.createTempDirectory("graft-sqlsess").toString
    spark.conf.set("spark.sql.catalog.sess", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sess.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sess.wh")

    // 1. partitioned CREATE + inserts (two-level identity layout)
    spark.sql("""CREATE TABLE sess.wh.events (
                   k BIGINT, cents BIGINT, d DATE, country STRING)
                 PARTITIONED BY (d, country)""")
    spark.sql("""INSERT INTO sess.wh.events (k, cents, d, country) VALUES
                 (1, 10, DATE'2024-07-01', 'US'),
                 (2, 20, DATE'2024-07-01', 'GB'),
                 (3, 30, DATE'2024-07-02', 'US')""")

    // 2. CTAS a derived mart
    spark.sql("""CREATE TABLE sess.wh.mart AS
                 SELECT country, CAST(sum(cents) AS BIGINT) AS cents
                 FROM sess.wh.events GROUP BY country""")
    assert(spark.sql("SELECT * FROM sess.wh.mart").count() === 2L)

    // 3. streaming CDC out of `events` INTO a replica, applied by SQL
    spark.sql("CREATE TABLE sess.wh.replica (k BIGINT, cents BIGINT)")
    val ckpt = s"$root/_ckpt"
    graft.streaming.GraftStreaming.changeFeedStreamByName(spark,
      "sess.wh.events", Seq("k"), "sqlsess", ckpt) { batch =>
      batch.createOrReplaceTempView("__cdc_batch")
      batch.sparkSession.sql(
        """INSERT INTO sess.wh.replica
           SELECT k, cents FROM __cdc_batch
           WHERE _change_type = 'insert'""")
      ()
    }.awaitTermination()
    assert(spark.sql("SELECT k, cents FROM sess.wh.replica")
      .as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 2L -> 20L, 3L -> 30L))

    // 4. MERGE with column-level assignments over both match sides
    spark.sql("""CREATE TABLE sess.wh.delta (k BIGINT, cents BIGINT,
                 d DATE, country STRING)""")
    spark.sql("""INSERT INTO sess.wh.delta VALUES
                 (2, 5, DATE'2024-07-01', 'GB'),
                 (9, 90, DATE'2024-07-03', 'FR')""")
    spark.sql("""MERGE INTO sess.wh.events t
                 USING sess.wh.delta s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET cents = t.cents + s.cents
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT k, cents FROM sess.wh.events")
      .as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 2L -> 25L, 3L -> 30L, 9L -> 90L))

    // 5. subquery DELETE (the idiomatic Postgres shape)
    spark.sql("""DELETE FROM sess.wh.events
                 WHERE k IN (SELECT k FROM sess.wh.delta
                             WHERE country = 'FR')""")
    assert(spark.sql("SELECT count(*) FROM sess.wh.events")
      .as[Long].head() === 3L)

    // 6. metadata-only RENAME, then read back through the new name
    spark.sql("ALTER TABLE sess.wh.events RENAME COLUMN cents TO price")
    assert(spark.sql(
      "SELECT CAST(sum(price) AS BIGINT) FROM sess.wh.events")
      .as[Long].head() === 65L)

    // 7. CALL history shows the whole trail; versions are addressable
    val hist = spark.sql("CALL sess.system.history('wh.events')")
      .select("version").as[Long].collect().toSeq
    assert(hist.size >= 5, s"expected a full commit trail, got $hist")
    // 8. time travel to the post-insert snapshot (v2): pre-merge
    //    prices, pre-rename shape
    val v2 = spark.sql("SELECT k, cents FROM sess.wh.events VERSION AS OF 2")
      .as[(Long, Long)].collect().toMap
    assert(v2 === Map(1L -> 10L, 2L -> 20L, 3L -> 30L))

    // 9. (round 15 additions) hidden-transform CTAS: days+bucket layout
    //    derived from the query, invisible in the logical schema
    spark.sql("""CREATE TABLE sess.wh.by_day
                 PARTITIONED BY (days(d), bucket(4, k)) AS
                 SELECT k, price, d FROM sess.wh.events""")
    assert(spark.table("sess.wh.by_day").columns.toSeq
      === Seq("k", "price", "d"))
    assert(spark.sql("""SELECT CAST(sum(price) AS BIGINT)
                        FROM sess.wh.by_day
                        WHERE d = DATE'2024-07-01'""")
      .as[Long].head() === 35L)

    // 10. lossless widen, then land a value beyond the old type
    spark.sql("ALTER TABLE sess.wh.replica ALTER COLUMN cents TYPE BIGINT")
    spark.sql(
      "INSERT INTO sess.wh.replica VALUES (99, 6000000000)")
    assert(spark.sql(
      "SELECT CAST(max(cents) AS BIGINT) FROM sess.wh.replica")
      .as[Long].head() === 6000000000L)

    // 11. the full merge program: by-source clauses + column-level
    //     insert in one statement
    spark.sql("""MERGE INTO sess.wh.replica t
                 USING sess.wh.delta s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET cents = t.cents + s.cents
                 WHEN NOT MATCHED AND s.country = 'FR'
                   THEN INSERT (k, cents) VALUES (s.k, s.cents * 100)
                 WHEN NOT MATCHED BY SOURCE AND t.k = 99 THEN DELETE""")
    assert(spark.sql("SELECT k, cents FROM sess.wh.replica")
      .as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 2L -> 25L, 3L -> 30L, 9L -> 9000L))

    // 12. static partition overwrite: reload one day of a
    //     single-level identity table without touching the others
    spark.sql("""CREATE TABLE sess.wh.daily (k BIGINT, cents BIGINT,
                 d DATE) PARTITIONED BY (d)""")
    spark.sql("""INSERT INTO sess.wh.daily (k, cents, d) VALUES
                 (1, 10, DATE'2024-07-01'), (2, 20, DATE'2024-07-02')""")
    spark.sql("""INSERT OVERWRITE sess.wh.daily
                 PARTITION (d = DATE'2024-07-01') (k, cents)
                 VALUES (7, 70)""")
    assert(spark.sql("SELECT k, cents FROM sess.wh.daily ORDER BY k")
      .as[(Long, Long)].collect().toSeq === Seq((2L, 20L), (7L, 70L)))
  }
}
