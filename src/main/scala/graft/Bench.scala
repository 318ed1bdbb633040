package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries
  * on SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Methodology: one untimed warmup pass (JIT/codegen/parquet footer
  * caches), then one timed pass executing each plan with a noop write —
  * full distributed execution, nothing collected to the driver.
  *
  * The driver captures only the LAST 2000 characters of process output
  * and parses the JSON line out of that window — round 5's line (89
  * queries, ~2.2k chars) outgrew it and the round's numbers were lost
  * ("parsed": null). So the printed line is hard-capped: per-query
  * entries are emitted in priority order (flagship/TPC-H/pipeline
  * queries first, then the rest alphabetically) until the line would
  * exceed [[MaxLine]]; the FULL per-query map is always written to
  * BENCH_DETAIL.json in the working directory for the judge.
  */
object Bench {

  /** Printed-line budget: 2000-char driver tail minus sbt's trailing
    * "[success] Total time ..." line (~80 chars) minus safety margin.
    */
  private val MaxLine = 1700

  /** Queries whose timings must survive truncation, most important
    * first: the e2e flagship, TPC-H shapes, the lastfm vertical, then
    * the LLM-pipeline headliners.
    */
  private val priority = Seq(
    "lastfm_e2e_royalties", "q1_pricing_summary", "q2_min_cost_supplier",
    "q3_top_revenue", "q4_order_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q11_important_stock",
    "q12_priority_lines", "q13_order_distribution", "q14_promo_share",
    "q15_top_supplier", "q16_supplier_count", "q17_small_qty",
    "q18_large_volume", "q19_discounted_revenue", "q20_excess_supply",
    "q21_waiting_supplier", "q22_global_sales", "lastfm_ingest", "lastfm_ods",
    "lastfm_fact", "lastfm_dm_royalties", "q_cosine_topk",
    "q_ann_ivf_topk", "q_ann_lsh_topk", "q_dedup_exact",
    "q_dedup_simhash", "q_embedding_neardup", "q_lang_id",
    "q_quality_score", "q_token_count", "q_session_windows",
    "q_asof_join", "q_range_join", "q_salted_join", "q_scd2",
    "q_grouping_sets", "q_impute_scalar", "q_json_extract",
    "q_dq_audit", "q_topk_per_group", "q_funnel", "q_retention",
    "q_forward_fill", "q_approx_quantiles", "q_window_sliding")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.benchQueries.toSeq.sortBy(_._1)
    def exec(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    qs.foreach { case (name, fn) =>
      try exec(fn) catch { case e: Throwable =>
        System.err.println(s"[bench warmup] $name failed: ${e.getMessage}")
      }
    }
    // A failed query must never read as a fast success: record -1 and an
    // entry in "errors" (round-1 swallowed Throwables silently).
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { exec(fn); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        errors += name; false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    def entry(kv: (String, Double)): String = "\"" + kv._1 + f"""\":${kv._2}%.3f"""
    def line(qJson: String): String =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":$qJson,"errors":$errJson,"sf":"$sfDir"}"""

    // Full detail always lands on disk, independent of line truncation.
    val fullJson = results.map(entry).mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (line(fullJson) + "\n").getBytes("UTF-8"))

    // Greedy fill under the budget: priority names first (failed/-1
    // entries included — an invisible failure is worse than a long
    // line), then the remainder alphabetically.
    val byName = results.toMap
    val ordered = priority.filter(byName.contains) ++
      results.map(_._1).filterNot(priority.contains)
    val picked = scala.collection.mutable.ArrayBuffer.empty[String]
    for (name <- ordered) {
      val candidate = picked :+ entry(name -> byName(name))
      if (line(candidate.mkString("{", ",", "}")).length <= MaxLine)
        picked += entry(name -> byName(name))
    }
    println(line(picked.mkString("{", ",", "}")))
    spark.stop()
  }
}
