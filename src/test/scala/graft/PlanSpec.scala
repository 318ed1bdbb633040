package graft

import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Relational

/** Physical-plan gates: the properties that make these queries scale are
  * asserted, not assumed — filter/column pushdown into the parquet scan,
  * broadcast joins for small dims, whole-stage codegen, partition
  * pruning on date-partitioned tables, and no cartesian products.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  private def finalPlan(df: DataFrame): String = {
    df.collect() // drive THIS QueryExecution through AQE to its final plan
    df.queryExecution.executedPlan.toString
  }

  test("q1: shipdate filter and column pruning reach the lineitem scan") {
    val p = formatted(Relational.q1PricingSummary.run(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter in:\n$p")
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema")).get
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"scan reads pruned columns: $readSchema")
  }

  test("q1: aggregation runs inside whole-stage codegen") {
    // the final (post-AQE) plan marks codegen'd operators with *(n)
    val p = finalPlan(Relational.q1PricingSummary.run(spark, dir))
    assert(p.contains("HashAggregate"))
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(p).isDefined,
      s"HashAggregate not inside a codegen stage:\n$p")
  }

  test("q3: the filtered customer dim is broadcast") {
    val p = finalPlan(Relational.q3TopRevenue.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
  }

  test("lastfm fact build: AQE picks broadcast for the small dims at this scale") {
    val p = finalPlan(graft.queries.ChartQueries.factQuery.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("date-partitioned ODS reads prune to the filtered partition") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-prune").resolve("ods").toString
    val df = Seq(
      (1, Date.valueOf("2024-05-01"), "US"),
      (2, Date.valueOf("2024-05-02"), "US"))
      .toDF("rank", "source_date", "country")
    graft.engine.Upsert.upsertPartitioned(spark, path, df,
      Seq("rank", "source_date", "country"), "source_date")
    val read = spark.read.parquet(path)
      .filter(col("source_date") === Date.valueOf("2024-05-01"))
    val p = formatted(read)
    assert(p.contains("PartitionFilters"), s"no partition filters in:\n$p")
    assert(p.contains("isnotnull(source_date"))
    // only one of the two date partitions is actually scanned
    read.collect()
    val scan = read.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metrics("numFiles").value === 1,
      s"expected 1 scanned file after pruning, got ${scan.metrics("numFiles").value}")
  }

  test("two-level (date, country) identity layout prunes on both levels") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-prune2").resolve("t").toString
    val df = Seq(
      (1, Date.valueOf("2024-05-01"), "US", 10L),
      (2, Date.valueOf("2024-05-01"), "GB", 20L),
      (3, Date.valueOf("2024-05-02"), "US", 30L),
      (4, Date.valueOf("2024-05-02"), "GB", 40L))
      .toDF("k", "d", "country", "cents")
    graft.engine.Upsert.appendLayout(spark, path, df, Seq("d", "country"))
    def scannedFiles(read: org.apache.spark.sql.DataFrame): Long = {
      read.collect()
      read.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get.metrics("numFiles").value
    }
    // both levels filtered: ONE of the four leaf directories scans
    val both = spark.read.parquet(path)
      .filter(col("d") === Date.valueOf("2024-05-01") &&
        col("country") === "US")
    assert(scannedFiles(both) === 1,
      "a (date, country) predicate must prune to one leaf")
    // first level only: exactly that date's two country leaves scan
    val dateOnly = spark.read.parquet(path)
      .filter(col("d") === Date.valueOf("2024-05-02"))
    assert(scannedFiles(dateOnly) === 2,
      "a date predicate must prune the date level")
    // second level only: still prunes (directory index covers both)
    val countryOnly = spark.read.parquet(path)
      .filter(col("country") === "GB")
    assert(scannedFiles(countryOnly) === 2,
      "a country predicate must prune the country level")
  }

  test("dim-filtered joins against partitioned facts use dynamic partition pruning") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-dpp").resolve("fact").toString
    val fact = (1 to 1000).map(i =>
      (i.toLong, Date.valueOf(f"2024-05-${i % 9 + 1}%02d")))
      .toDF("k", "date")
    fact.write.partitionBy("date").parquet(path)
    val dimPath = Files.createTempDirectory("graft-dpp").resolve("dim").toString
    (1 to 9).map(d => (Date.valueOf(f"2024-05-$d%02d"), s"tag$d"))
      .toDF("date", "tag").write.parquet(dimPath)
    val joined = spark.read.parquet(path)
      .join(spark.read.parquet(dimPath).filter(col("tag") === "tag3"), Seq("date"))
    val p = formatted(joined)
    assert(p.contains("dynamicpruning"),
      s"expected dynamic partition pruning in:\n$p")
  }

  test("scd2: both window passes share one hash shuffle on user_id") {
    val p = formatted(graft.queries.WarehouseQueries.qScd2.run(spark, dir))
    val hashExchanges = "Arguments: hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges === 1,
      s"expected exactly 1 hash exchange feeding both windows, got $hashExchanges:\n$p")
  }

  test("decontaminate: the eval gram set is broadcast, the corpus side is not shuffled before the join") {
    val p = finalPlan(graft.queries.CurationQueries.qDecontaminate.run(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$p")
  }

  test("bloom prune: dim broadcast, native might_contain probe filtering the fact scan") {
    // build and probe are Spark's own bloom expressions (registered by
    // GraftExtensions): the bloom aggregates executor-side and reaches
    // the probe as a scalar-subquery result — no UDF, no driver key list
    val df = graft.queries.WarehouseQueries.qBloomPrune.run(spark, dir)
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"), s"dim join not broadcast:\n$p")
    val f = formatted(df)
    assert(f.contains("might_contain"), s"bloom probe filter missing:\n$f")
    assert(!f.contains("UDF"), s"bloom probe still a UDF:\n$f")
    assert(f.contains("PushedFilters: [IsNotNull(l_suppkey)]"),
      s"suppkey null filter not pushed to the fact scan:\n$f")
  }

  test("lateral top-k decorrelates to a map-side WindowGroupLimit, not per-row re-execution") {
    val p = graft.queries.AnalyticQueries.qLateralTopk.run(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$p")
    assert(!p.contains("LateralJoin"), s"lateral not decorrelated:\n$p")
  }

  test("rolling DAU/WAU plans as pure hash aggregates — no window over the stream") {
    val p = finalPlan(graft.queries.EventQueries.qRollingDau.run(spark, dir))
    assert(!p.contains("Window"), s"unexpected window operator in:\n$p")
    assert(p.contains("HashAggregate"), s"no hash aggregate in:\n$p")
  }

  test("peak-concurrency sweep windows partition by day, never globally") {
    val p = finalPlan(graft.queries.EventQueries.qPeakConcurrency.run(spark, dir))
    assert(p.contains("windowspecdefinition(day_id"),
      s"sweep window not partitioned by day_id:\n$p")
  }

  test("snapshot diff is a single full-outer sort-merge join, no cartesian") {
    val p = finalPlan(graft.queries.WarehouseQueries.qSnapshotDiff.run(spark, dir))
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"),
      s"expected full-outer sort-merge join in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("no plan in the registry contains an unpartitioned WindowExec over unbounded input") {
    // A WindowExec with an empty partition spec funnels its whole input
    // through ONE task — the canonical scale-killer. Global rank/cumsum/
    // ntile run through engine.DistributedRank instead (two-phase
    // range-partitioned); bounded-aggregate windows (q_benford_audit's
    // ≤9-row share denominator) carry an explicit constant partition
    // key, so NO query in the registry is exempt from this gate.
    // Iterative/bounded-validator queries are skipped as in the
    // cartesian gate below.
    val skip = Set("q_ngram_jaccard", "q_containment",
      "q_dedup_groups", "q_corpus_clean", "q_split_leakproof")
    SparkEntry.registry
      .filterNot(q => skip(q.name)).foreach { q =>
        val plan = q.run(spark, dir).queryExecution.sparkPlan
        val bad = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }
        assert(bad.isEmpty,
          s"${q.name} plans an unpartitioned window:\n${bad.mkString("\n")}")
      }
  }

  test("no plan in the registry contains a cartesian product (except the bounded validators)") {
    // q_ngram_jaccard: explicit bounded all-pairs validator.
    // q_dedup_groups / q_corpus_clean / q_split_leakproof: iterative —
    // run() executes the label-propagation loop eagerly and returns a
    // checkpointed leaf, so plan inspection both costs a full run and
    // sees no joins; their candidate-join shape is already swept via
    // q_dedup_minhash.
    val allowed = Set("q_ngram_jaccard", "q_containment",
      "q_dedup_groups", "q_corpus_clean", "q_split_leakproof")
    SparkEntry.registry.filterNot(q => allowed(q.name)).foreach { q =>
      val p = q.run(spark, dir).queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product")
    }
  }
}
