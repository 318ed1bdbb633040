package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL entry points for the library engines (GraftExtensions TVFs):
  * `global_rank` must match `row_number() OVER (ORDER BY …)` exactly
  * while planning WITHOUT the single-task window, and
  * `grouped_quantiles` must match the built-in `percentile` aggregate
  * bit-for-bit (the engine replicates its interpolation formula).
  */
class SqlTvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seedViews(): Unit = {
    val r = new scala.util.Random(7)
    (1 to 500).map(i => (i.toLong, r.nextInt(1000).toLong,
        s"g${i % 3}", r.nextInt(100000).toLong))
      .toDF("id", "amount", "grp", "cents")
      .createOrReplaceTempView("tvf_t")
  }

  test("global_rank matches row_number over the same order") {
    seedViews()
    val got = spark.sql(
      "SELECT id, rk FROM global_rank('tvf_t', 'amount DESC, id', 'rk')")
      .as[(Long, Long)].collect().toMap
    val want = spark.sql(
      """SELECT id, row_number() OVER (ORDER BY amount DESC, id) AS rk
        |FROM tvf_t""".stripMargin)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("global_rank composes with downstream SQL (filter + join)") {
    seedViews()
    val top = spark.sql(
      """SELECT t.grp, count(*) AS n
        |FROM global_rank('tvf_t', 'amount DESC, id', 'rk') g
        |JOIN tvf_t t USING (id)
        |WHERE g.rk <= 10
        |GROUP BY t.grp""".stripMargin)
    assert(top.agg(sum("n")).as[Long].head() === 10L)
  }

  test("global_rank plans no partition-less WindowExec") {
    seedViews()
    val plan = spark.sql(
      "SELECT * FROM global_rank('tvf_t', 'amount, id', 'rk')")
      .queryExecution.executedPlan.toString
    // the exec node prints with the Exec suffix stripped; the child is
    // a range-partitioned sort, never a single-task window
    assert(plan.contains("GlobalRank"), plan)
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("grouped_quantiles matches the percentile aggregate exactly") {
    seedViews()
    val got = spark.sql(
      """SELECT grp, p50, p95 FROM
        |grouped_quantiles('tvf_t', 'grp', 'cents', 'p50=0.5,p95=0.95')"""
        .stripMargin)
      .as[(String, Double, Double)].collect()
      .map { case (g, l, h) => g -> (l, h) }.toMap
    val want = spark.sql(
      """SELECT grp, percentile(cents, 0.5) AS p50,
        |       percentile(cents, 0.95) AS p95
        |FROM tvf_t GROUP BY grp""".stripMargin)
      .as[(String, Double, Double)].collect()
      .map { case (g, l, h) => g -> (l, h) }.toMap
    assert(got.keySet === Set("g0", "g1", "g2"))
    assert(got === want)
  }

  test("bad TVF arguments fail descriptively") {
    seedViews()
    val e = intercept[Exception](
      spark.sql("SELECT * FROM global_rank('tvf_t', 'amount')").collect())
    assert(e.getMessage.contains("global_rank"), e.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM grouped_quantiles('tvf_t','grp','cents','p50-0.5')")
      .collect())
    assert(e2.getMessage.contains("out_name=probability"), e2.getMessage)
  }

  test("pagerank TVF matches the DataFrame recurrence on the same edges") {
    // path graph 1–2–3 bidirectional, as a view
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("a", "b")
      .createOrReplaceTempView("tvf_edges")
    val got = spark.sql(
      "SELECT node, pr FROM pagerank('tvf_edges', 'a', 'b', 3)")
      .as[(Long, Long)].collect().toMap
    val (w, deg) = graft.queries.GraphQueries.weight(
      spark.table("tvf_edges")
        .select(col("a").as("src"), col("b").as("dst")))
    val want = graft.queries.GraphQueries.pagerankIterate(w, deg, 3)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got.keySet === Set(1L, 2L, 3L))
  }

  test("pagerank TVF composes with downstream SQL and bounds iterations") {
    Seq((1L, 2L), (2L, 1L)).toDF("a", "b")
      .createOrReplaceTempView("tvf_edges2")
    // downstream filter + order over the expansion
    val top = spark.sql(
      """SELECT node FROM pagerank('tvf_edges2', 'a', 'b', 2)
        |WHERE pr > 0 ORDER BY node""".stripMargin)
      .as[Long].collect()
    assert(top.toSeq === Seq(1L, 2L))
    // plan-depth cap: a non-literal or out-of-range count is refused
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM pagerank('tvf_edges2', 'a', 'b', 999)").collect())
    assert(e.getMessage.contains("1..16"), e.getMessage)
  }

  test("connected_components TVF labels components; rounds are capped") {
    // two components: {1,2,3} (min 1) and {7,8} (min 7)
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (7L, 8L), (8L, 7L))
      .toDF("a", "b").createOrReplaceTempView("cc_edges")
    val got = spark.sql(
      "SELECT node, component FROM connected_components('cc_edges', 'a', 'b', 4)")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
    // agrees with the until-convergence engine on the same edges
    val fixpoint = graft.engine.LabelPropagation.components(
      spark.table("cc_edges")
        .select(col("a").as("src"), col("b").as("dst")))
      .as[(Long, Long)].collect().toMap
    assert(got === fixpoint)
    // plan-depth cap, like pagerank's
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM connected_components('cc_edges', 'a', 'b', 99)").collect())
    assert(e.getMessage.contains("1..16"), e.getMessage)
  }

  test("ppr TVF resolves both relations by name and matches the DataFrame form") {
    // directed line 1→2→3→4 with a back-edge 3→2; seeds {1}
    Seq((1L, 2L), (2L, 3L), (3L, 2L), (3L, 4L)).toDF("a", "b")
      .createOrReplaceTempView("ppr_edges")
    Seq(1L).toDF("n").createOrReplaceTempView("ppr_seeds")
    val got = spark.sql(
      "SELECT node, pr FROM ppr('ppr_edges', 'a', 'b', 'ppr_seeds', 'n', 2)")
      .as[(Long, Long)].collect().toMap
    val (w, _) = graft.queries.GraphQueries.weight(
      spark.table("ppr_edges")
        .select(col("a").as("src"), col("b").as("dst")))
    val want = graft.queries.GraphQueries.pprIterate(
      w, Seq(1L).toDF("node"), 2)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    // the reached set after 2 rounds from seed 1 — node 4 not yet
    assert(got.keySet === Set(1L, 2L, 3L))
  }

  test("ppr TVF composes downstream and enforces its literal contracts") {
    Seq((1L, 2L), (2L, 1L)).toDF("a", "b")
      .createOrReplaceTempView("ppr_edges2")
    Seq(1L, 2L).toDF("n").createOrReplaceTempView("ppr_seeds2")
    val top = spark.sql(
      """SELECT node FROM ppr('ppr_edges2', 'a', 'b', 'ppr_seeds2', 'n', 2)
        |WHERE pr > 0 ORDER BY node""".stripMargin)
      .as[Long].collect()
    assert(top.toSeq === Seq(1L, 2L))
    val depth = intercept[Exception](spark.sql(
      "SELECT * FROM ppr('ppr_edges2', 'a', 'b', 'ppr_seeds2', 'n', 99)")
      .collect())
    assert(depth.getMessage.contains("1..16"), depth.getMessage)
    val arity = intercept[Exception](spark.sql(
      "SELECT * FROM ppr('ppr_edges2', 'a', 'b', 2)").collect())
    assert(arity.getMessage != null)
  }

  test("table_changes TVF matches ChangeFeed.changes and composes downstream") {
    val p = java.nio.file.Files.createTempDirectory("graft-tvf-cdc")
      .resolve("t").toString
    val d1 = java.sql.Date.valueOf("2024-07-01")
    graft.engine.Upsert.upsertPartitioned(spark, p,
      Seq((1, d1, 100L), (2, d1, 200L)).toDF("k", "d", "cents"),
      Seq("k", "d"), "d")
    val v1 = graft.engine.Manifest.currentVersion(spark, p).get
    graft.engine.Upsert.overwritePartitions(spark, p,
      Seq((1, d1, 100L), (3, d1, 300L)).toDF("k", "d", "cents"), "d")
    val v2 = graft.engine.Manifest.currentVersion(spark, p).get
    val got = spark.sql(
      s"SELECT k, cents, _change_type FROM table_changes('$p', $v1, $v2, 'k')")
      .as[(Int, Long, String)].collect().toSet
    val want = graft.engine.ChangeFeed.changes(spark, p, v1, v2, Seq("k"))
      .select("k", "cents", "_change_type")
      .as[(Int, Long, String)].collect().toSet
    assert(got === want)
    assert(got === Set((2, 200L, "delete"), (3, 300L, "insert")))
    // composes: aggregate over the feed in plain SQL
    val n = spark.sql(
      s"""SELECT count(*) FROM table_changes('$p', $v1, $v2, 'k')
          WHERE _change_type = 'delete'""").as[Long].head()
    assert(n === 1L)
    val arity2 = intercept[Exception](spark.sql(
      s"SELECT * FROM table_changes('$p', $v1, $v2)").collect())
    assert(arity2.getMessage != null)
    val badVer = intercept[Exception](spark.sql(
      s"SELECT * FROM table_changes('$p', 'x', $v2, 'k')").collect())
    assert(badVer.getMessage.contains("integer literal"), badVer.getMessage)
  }
}
