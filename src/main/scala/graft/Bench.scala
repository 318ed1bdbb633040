package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries
  * on SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Methodology: one untimed warmup pass (JIT/codegen/parquet footer
  * caches), then a timed pass executing each plan with a noop write —
  * full distributed execution, nothing collected to the driver. Each
  * query is timed [[Reps]] times (min reported): a single-JVM suite of
  * 150 plans carries GC debt from whichever heavy query ran before, and
  * the min-of-reps strips that one-sided noise without hiding real cost
  * (a genuinely slow plan is slow on every rep). A `System.gc()` before
  * each query's reps settles the heap AND lets the ContextCleaner
  * reclaim the previous queries' broadcast blocks (they are freed via
  * weak references, so an un-GC'd suite accumulates dead broadcasts in
  * executor memory). The generated-code cache is raised from Spark's
  * 100-entry default: the suite compiles far more than 100 codegen
  * units, so at the default every timed query recompiles what warmup
  * already compiled — measured as a thin ~0.3-0.7 s tax spread across
  * the whole suite (round-6 "drift"). Set SPARK_GRAFT_BENCH_REPS to
  * change the rep count and SPARK_GRAFT_BENCH_ORDER=reverse to run the
  * timed pass in reverse registry order (the neighbor-contention
  * experiment: a query's time should not depend on its neighbors).
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

  /** Suite-wide task-metric accumulator: per-query executor evidence
    * (shuffle volume, spill, scan input) recorded alongside the
    * timings in BENCH_DETAIL.json — the "is this plan shuffle-lean and
    * spill-free at this SF" numbers, measured rather than asserted.
    */
  private final class MetricsListener
      extends org.apache.spark.scheduler.SparkListener {
    private val zero = () => Map(
      "shuffle_read_bytes" -> 0L, "shuffle_write_bytes" -> 0L,
      "spill_disk_bytes" -> 0L, "spill_mem_bytes" -> 0L,
      "input_bytes" -> 0L, "n_tasks" -> 0L)
    private var acc = zero()
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      synchronized {
        val m = te.taskMetrics
        if (m != null) acc = Map(
          "shuffle_read_bytes" ->
            (acc("shuffle_read_bytes") + m.shuffleReadMetrics.totalBytesRead),
          "shuffle_write_bytes" ->
            (acc("shuffle_write_bytes") + m.shuffleWriteMetrics.bytesWritten),
          "spill_disk_bytes" -> (acc("spill_disk_bytes") + m.diskBytesSpilled),
          "spill_mem_bytes" -> (acc("spill_mem_bytes") + m.memoryBytesSpilled),
          "input_bytes" -> (acc("input_bytes") + m.inputMetrics.bytesRead),
          "n_tasks" -> (acc("n_tasks") + 1))
      }
    def reset(): Unit = synchronized { acc = zero() }
    def snapshot(): Map[String, Long] = synchronized(acc)
  }

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

  /** 1-minute load average — read at start (before this JVM loads the
    * machine, so a high value is EXTERNAL load) and at end.
    */
  private[graft] def loadavg1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Machine-wide busy jiffies (user+nice+system+irq+softirq+steal)
    * from /proc/stat's aggregate cpu line. Deltas, divided by USER_HZ
    * (100), give system-wide busy CPU-seconds — subtracting this
    * process's own CPU time yields OTHER-process CPU burn during the
    * run: the direct round-8-contamination signal (byte-identical work,
    * 4x wall = someone else held the cores).
    */
  private[graft] def systemBusyJiffies(): Long =
    try {
      val f = scala.io.Source.fromFile("/proc/stat")
        .getLines().next().split("\\s+")
      // cpu user nice system idle iowait irq softirq steal ...
      Seq(1, 2, 3, 6, 7, 8).map(i =>
        if (i < f.length) f(i).toLong else 0L).sum
    } catch { case _: Throwable => -1L }

  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  /** Parsed slice of a prior BENCH_DETAIL.json: per-query wall seconds,
    * per-query process-CPU seconds, and per-query executor evidence
    * (n_tasks / shuffle bytes). Used by [[driftVerdict]] to mechanize
    * the drift-vs-code arbitration the round-14→16 SCALE.md entries did
    * by hand: identical task counts and shuffle bytes with uniformly
    * scaled CPU-per-query is host clock drift, NOT a plan change.
    */
  private[graft] final case class BaselineDetail(
      wall: Map[String, Double],
      cpu: Map[String, Double],
      exec: Map[String, Map[String, Long]],
      ncpus: Option[Int] = None,
      quiescedAtStart: Option[Boolean] = None)

  private[graft] def readBaseline(path: String): Option[BaselineDetail] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(new java.io.File(path))
      import scala.jdk.CollectionConverters._
      def numMap(field: String): Map[String, Double] =
        Option(root.get(field)).map { n =>
          n.properties().asScala
            .map(e => e.getKey -> e.getValue.asDouble()).toMap
        }.getOrElse(Map.empty)
      val exec = Option(root.get("exec")).map { n =>
        n.properties().asScala.map { e =>
          e.getKey -> e.getValue.properties().asScala
            .map(f => f.getKey -> f.getValue.asLong()).toMap
        }.toMap
      }.getOrElse(Map.empty[String, Map[String, Long]])
      val ncpus = Option(root.get("env")).flatMap(e =>
        Option(e.get("ncpus"))).map(_.asInt())
      val quiesced = Option(root.get("env")).flatMap(e =>
        Option(e.get("quiesced_at_start"))).map(_.asBoolean())
      Some(BaselineDetail(numMap("queries"), numMap("cpu"), exec, ncpus,
        quiesced))
    } catch { case _: Throwable => None }

  /** Default drift baseline (round-17 verdict ask 6): the most recent
    * committed QUIESCED record matching this run's parallelism —
    * `BENCH_DETAIL_r<N>_<phase>_quiesced.json`, ranked by round then
    * phase (close of a round postdates its early anchor), skipping any
    * whose env says a different ncpus or a failed quiesce gate. Falls
    * back to the working-tree BENCH_DETAIL.json (the pre-round-18
    * behavior) when no quiesced record qualifies, so a fresh checkout
    * still gets a verdict.
    */
  private[graft] def defaultBaseline(runNcpus: Int,
      dir: java.io.File = new java.io.File(".")): Option[String] = {
    val re = """BENCH_DETAIL_r(\d+)_([a-z]+)_quiesced\.json""".r
    val ranked = Option(dir.listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        f.getName match {
          case re(r, phase) =>
            Some((f, r.toInt, if (phase == "early") 0 else 1))
          case _ => None
        }
      }
      .sortBy { case (f, round, phase) => (-round, -phase, -f.lastModified) }
    ranked.find { case (f, _, _) =>
      readBaseline(f.getPath).exists(b =>
        b.ncpus.contains(runNcpus) && b.quiescedAtStart.contains(true))
    }.map(_._1.getName)
      .orElse(Option("BENCH_DETAIL.json")
        .filter(p => new java.io.File(dir, p).isFile))
  }

  /** The mechanized arbitration (round-16 verdict ask 6). Compares this
    * run's per-query evidence against a baseline detail record and
    * returns a JSON object with a one-line verdict:
    *
    *  - work-identical query = same n_tasks AND same shuffle_write_bytes
    *    as the baseline (bytes are plan-deterministic, so equality means
    *    the engine did the same work);
    *  - if ≥90% of the common set is work-identical, any wall/CPU move
    *    is the host, not the code: `host-drift` when the median ratios
    *    leave ±10% wall / ±15% CPU, else `stable`;
    *  - otherwise `code-change`, naming the queries whose task/shuffle
    *    footprint moved most.
    */
  /** JSON string-escape for values interpolated into the hand-built
    * records (the baseline PATH is caller-controlled — a quote or
    * backslash in it must not corrupt BENCH_DETAIL.json).
    */
  private def jstr(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private[graft] def driftVerdict(
      baselinePath0: String, base: BaselineDetail,
      wall: Map[String, Double], cpu: Map[String, Double],
      exec: Map[String, Map[String, Long]],
      runNcpus: Int): String = {
    val baselinePath = jstr(baselinePath0)
    // a baseline captured at a different parallelism has legitimately
    // different task counts and shuffle splits — comparing would read
    // as a spurious "code-change" (round-17 close lesson: an 8-cpu
    // verification run clobbered the 32-cpu baseline's comparability)
    base.ncpus.filter(_ != runNcpus).foreach { n =>
      return s"""{"baseline":"$baselinePath","verdict":"baseline-incomparable","baseline_ncpus":$n,"run_ncpus":$runNcpus}"""
    }
    val common = wall.keySet.intersect(base.wall.keySet)
      .filter(q => wall(q) >= 0 && base.wall(q) >= 0 &&
        exec.contains(q) && base.exec.contains(q)).toSeq.sorted
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0 else xs.sorted.apply(xs.size / 2)
    val identical = common.filter { q =>
      val (a, b) = (exec(q), base.exec(q))
      // task counts are plan-deterministic and must match exactly;
      // shuffle bytes carry sub-0.1% run-to-run jitter from compressed
      // frame boundaries (measured on back-to-back unchanged-code runs),
      // so "identical work" tolerates 1% there
      val (sa, sb) = (a.getOrElse("shuffle_write_bytes", -1L),
        b.getOrElse("shuffle_write_bytes", -2L))
      a.getOrElse("n_tasks", -1L) == b.getOrElse("n_tasks", -2L) &&
        math.abs(sa - sb) <= math.max(4096L, (0.01 * math.max(sa, sb)).toLong)
    }
    val identPct =
      if (common.isEmpty) 0.0 else identical.size.toDouble / common.size
    val wallRatio = median(identical.map(q =>
      wall(q) / math.max(1e-9, base.wall(q))))
    val cpuRatio = median(identical.flatMap(q =>
      for (a <- cpu.get(q); b <- base.cpu.get(q) if b > 1e-9) yield a / b))
    val changed = common.filterNot(identical.contains).sortBy { q =>
      -math.abs(exec(q).getOrElse("shuffle_write_bytes", 0L) -
        base.exec(q).getOrElse("shuffle_write_bytes", 0L))
    }.take(5)
    val verdict =
      if (common.isEmpty) "no-overlap"
      else if (identPct >= 0.9) {
        if (cpuRatio > 0 && math.abs(cpuRatio - 1.0) > 0.15) "host-drift"
        else if (wallRatio > 0 && math.abs(wallRatio - 1.0) > 0.10)
          "host-drift"
        else "stable"
      } else "code-change"
    val changedJson = changed.map("\"" + _ + "\"").mkString("[", ",", "]")
    f"""{"baseline":"$baselinePath","n_common":${common.size},"work_identical_pct":$identPct%.3f,"median_wall_ratio":$wallRatio%.3f,"median_cpu_ratio":$cpuRatio%.3f,"changed_queries":$changedJson,"verdict":"$verdict"}"""
  }

  def main(args: Array[String]): Unit = {
    // The driver parses the JSON line out of the LAST 2000 chars of
    // combined process output — any stray stderr (a WARN-level log4j
    // stack trace landed right before round 7's line) competes with it
    // for that window. Route ALL stderr for this forked JVM to a log
    // file instead: the redirect precedes SparkSession creation, so
    // log4j's console appender binds to the file stream, and uncaught-
    // exception traces (ThreadGroup reads System.err dynamically) land
    // there too. stdout carries exactly one line: the JSON result.
    System.setErr(new java.io.PrintStream(
      new java.io.FileOutputStream("bench_stderr.log"), true, "UTF-8"))
    val loadavgStart = loadavg1() // before this JVM loads the machine
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Static conf, so it must land before the first session: the
      // whole suite holds >>100 codegen units and the default cache
      // evicts warmup's compilations before the timed pass reuses them.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // Round-18 optimization (guide §2.2 "let AQE coalesce"): let AQE
      // re-partition CACHED plans. The session-cached derived relations
      // (fulfillment graph, tokenized docs, hashed shingles) otherwise
      // persist with their build shuffle's partition count regardless
      // of size, and every per-level scan of the iterative graph
      // queries inherits it — measured at sf0.1: the graph family ran
      // 2.8k tasks summing ~350 executor-seconds on kB-sized
      // partitions; with AQE sizing the cache the same queries run
      // ~5x fewer tasks and 3-250x less task time (q_kcore 35.3s →
      // 0.14s) at identical results. Scale-adaptive by construction —
      // AQE targets advisoryPartitionSizeInBytes, so TB-sized cached
      // relations keep hundreds of partitions; nothing here is tuned
      // to the local core count.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      // Round-18 optimization (guide §3.1/§9): allow shuffled-hash
      // joins where the per-partition build side fits (the planner's
      // own size conditions still gate it), and let AQE rewrite
      // sort-merge to shuffled-hash when every post-shuffle partition
      // is under 64 MB — drops the per-partition sorts. Measured
      // 10-30% on the join-heavy suite members (q2 0.94→0.66 s,
      // q21 2.0→1.7 s, q_setsim_join 2.75→2.30 s), no regressions
      // outside noise. Scale story: 64 MB per-partition hash builds
      // are executor-memory-safe at any input size because AQE's
      // partition sizing targets advisoryPartitionSizeInBytes.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "64m")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ITER_CHECKPOINT=reliable routes the iterative loops
    // through cluster-durable checkpoints (engine.Checkpoints) so the
    // local-vs-reliable cost delta is measurable with the same bench
    // harness; dev-only, the driver never sets it.
    sys.env.get("SPARK_GRAFT_ITER_CHECKPOINT").foreach { mode =>
      spark.conf.set(graft.engine.Checkpoints.ConfKey, mode)
      if (mode == "reliable")
        spark.sparkContext.setCheckpointDir(
          s"/tmp/graft_bench_ckpt_${ProcessHandle.current.pid}")
    }
    // SPARK_GRAFT_BENCH_CONF="k=v;k=v" overlays session confs — the
    // config-hypothesis A/B hook (dev-only; the driver never sets it;
    // filtered-run discipline applies: records written under an
    // overlay are iteration probes, not the committed record).
    val confOverlay = sys.env.get("SPARK_GRAFT_BENCH_CONF")
    confOverlay.foreach {
      // self-documenting overlay (round-19 advice): log every applied
      // pair AND every skipped fragment — a typo'd hypothesis must not
      // silently measure the baseline while labeled as the experiment
      _.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        if (kv.contains("=")) {
          val Array(k, v) = kv.split("=", 2)
          spark.conf.set(k, v)
          System.err.println(s"[bench conf-overlay] applied $k=$v")
        } else System.err.println(
          s"[bench conf-overlay] SKIPPED fragment without '=': '$kv'")
      }
    }
    // SPARK_GRAFT_BENCH_FILTER=q_a,q_b restricts the run to the named
    // queries — the single-query iteration loop (full-suite numbers
    // still come from unfiltered runs; the driver never sets this).
    val keep = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val sorted = SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => keep.forall(_.contains(n)) }
    // a typo'd filter must not print a plausible 0-query success line
    require(sorted.nonEmpty,
      s"SPARK_GRAFT_BENCH_FILTER matched no registered query: ${keep.get}")
    val qs =
      if (sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("reverse"))
        sorted.reverse
      else sorted
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
    val metrics = new MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    val execStats = scala.collection.mutable.LinkedHashMap
      .empty[String, Map[String, Long]]
    val cpuStats = scala.collection.mutable.LinkedHashMap
      .empty[String, Double]
    // Environment evidence window: loadavg was sampled at process start
    // (external load — this JVM hadn't loaded the machine yet); the
    // jiffies/process-CPU snapshots bracket the TIMED pass, so
    // other-process CPU burn is attributed to the same window the wall
    // clock measures.
    // Quiesce gate (round-10 verdict item 6): the official record must
    // be captured under the same discipline as the committed quiesced
    // re-records, so WAIT for other-process CPU to drain before opening
    // the timed window instead of timing into known contention. Each
    // probe samples other-process CPU over 2 s (busy-jiffies delta
    // minus our own process CPU — loadavg is useless here, warmup just
    // loaded the machine with OUR work); >5% of machine capacity defers
    // the timed pass 15 s, up to SPARK_GRAFT_QUIESCE_WAIT_SEC (default
    // 600, 0 disables). If the deadline passes still-contended, we run
    // anyway — the env block's cpu_other_sec/contended fields then
    // carry the evidence, plus quiesce_wait_sec shows the gate tried.
    val quiesceDeadlineSec =
      sys.env.getOrElse("SPARK_GRAFT_QUIESCE_WAIT_SEC", "600").toInt
    val quiesceWall0 = System.nanoTime()
    var quiesced = false
    while (!quiesced &&
        (System.nanoTime() - quiesceWall0) / 1e9 < quiesceDeadlineSec) {
      val j0 = systemBusyJiffies(); val p0 = osBean.getProcessCpuTime
      Thread.sleep(2000)
      val j1 = systemBusyJiffies(); val p1 = osBean.getProcessCpuTime
      val other = if (j0 < 0 || j1 < 0) 0.0
        else math.max(0.0, (j1 - j0) / 100.0 - (p1 - p0) / 1e9)
      if (other <= 0.05 * 2.0 * cpus.toInt) quiesced = true
      else {
        System.err.println(
          f"[bench quiesce] other-process cpu ${other}%.1fs over 2s probe; " +
            "deferring timed pass 15s")
        Thread.sleep(15000)
      }
    }
    val quiesceWaitSec = (System.nanoTime() - quiesceWall0) / 1e9
    val timedJiffies0 = systemBusyJiffies()
    val timedProcCpu0 = osBean.getProcessCpuTime
    val timedWall0 = System.nanoTime()
    val repTimes = qs.map { case (name, fn) =>
      System.gc() // settle heap + release prior queries' broadcasts
      org.apache.spark.graftshim.CoreShims
        .drainListenerBus(spark.sparkContext)
      metrics.reset()
      val qCpu0 = osBean.getProcessCpuTime
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { exec(fn); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      }
      cpuStats(name) = (osBean.getProcessCpuTime - qCpu0) / 1e9 / reps
      // flush async task-end events, then attribute a PER-REP average
      // (bytes are plan-deterministic; the mean strips rep count)
      org.apache.spark.graftshim.CoreShims
        .drainListenerBus(spark.sparkContext)
      execStats(name) = metrics.snapshot().map {
        case (k, v) => k -> v / reps
      }
      if (times.forall(_ < 0)) errors += name
      name -> times
    }
    val results = repTimes.map { case (name, times) =>
      val ok = times.filter(_ >= 0)
      name -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    // Environment block: other-process CPU-seconds during the timed
    // window is the contamination detector. A quiesced run shows
    // cpu_other_sec near zero; round 8's contaminated record would have
    // shown hundreds (driver regenerating testdata on the same cores).
    // `contended` fires when other processes held >15% of the machine's
    // CPU capacity over the timed window, or when external load was
    // already high before this JVM started.
    val timedWallSec = (System.nanoTime() - timedWall0) / 1e9
    val procCpuSec = (osBean.getProcessCpuTime - timedProcCpu0) / 1e9
    val jiffies1 = systemBusyJiffies()
    val otherCpuSec =
      if (timedJiffies0 < 0 || jiffies1 < 0) -1.0
      else math.max(0.0, (jiffies1 - timedJiffies0) / 100.0 - procCpuSec)
    val nCpus = cpus.toInt
    val loadavgEnd = loadavg1()
    // two triggers: >15% of MACHINE capacity (the original rule — a
    // co-running compile), or other-process CPU exceeding one full
    // core-second per wall-second (round-17's raw record burned 722
    // other-CPU-s over a 570 s window — heavily contended — yet read
    // contended:false because 722 was under 15% of 32 cores; accepted
    // quiesced records run 0–0.7 cores of background, so one core is
    // the honest line)
    val contended = (otherCpuSec >= 0 &&
      (otherCpuSec > 0.15 * timedWallSec * nCpus ||
        otherCpuSec > timedWallSec)) || loadavgStart > nCpus / 4.0
    // cpu_queries_sec is the work-normalized suite total (sum of
    // per-query per-rep process-CPU seconds): drift-resistant where the
    // wall total is not, printed alongside it on the one-line record.
    def envJson: String =
      f"""{"loadavg_start":$loadavgStart%.2f,"loadavg_end":$loadavgEnd%.2f,"timed_wall_sec":$timedWallSec%.1f,"cpu_proc_sec":$procCpuSec%.1f,"cpu_other_sec":$otherCpuSec%.1f,"cpu_queries_sec":${cpuStats.values.filter(_ >= 0).sum}%.1f,"ncpus":$nCpus,"contended":$contended,"quiesce_wait_sec":$quiesceWaitSec%.1f,"quiesced_at_start":$quiesced}"""
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    def entry(kv: (String, Double)): String = "\"" + kv._1 + f"""\":${kv._2}%.3f"""
    // n_shown/shown_sum make the truncated line internally consistent
    // (round-8 advice: a dict holding 65 of 153 entries summing 68 s
    // against a 249 s total read as corruption): a consumer can check
    // len(queries)==n_shown and sum(queries)==shown_sum, and knows the
    // full dict lives in BENCH_DETAIL.json.
    def line(qJson: String, nShown: Int, shownSum: Double): String =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_shown":$nShown,"shown_sum":$shownSum%.3f,"detail_file":"BENCH_DETAIL.json","env":$envJson,"queries":$qJson,"errors":$errJson,"sf":"$sfDir"}"""

    // Full detail always lands on disk, independent of line truncation,
    // plus every rep's raw time (the noise-vs-regression evidence: a
    // wide rep spread is suite noise, a tight slow spread is real).
    val fullJson = results.map(entry).mkString("{", ",", "}")
    val repsJson = repTimes.map { case (name, times) =>
      "\"" + name + "\":" +
        times.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val execJson = execStats.map { case (name, m) =>
      "\"" + name + "\":{" +
        m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
          .mkString(",") + "}"
    }.mkString("{", ",", "}")
    // Per-query process-CPU seconds (per rep; the pre-query System.gc()
    // runs before the snapshot window). wall≫cpu on a query whose exec
    // bytes are unchanged = descheduled threads, i.e. external
    // contention, not a plan regression.
    val cpuJson = cpuStats.map { case (name, c) =>
      "\"" + name + f"""\":$c%.3f"""
    }.mkString("{", ",", "}")
    // Work-normalized totals (round-16 verdict ask 6): total process-CPU
    // seconds, task count, and shuffle bytes across the suite. Wall time
    // moves with the host's effective clock; these move only with the
    // plans — a round whose cpu_total and shuffle_total match the prior
    // record while wall rises is drift, computed rather than argued.
    val cpuTotal = cpuStats.values.filter(_ >= 0).sum
    val tasksTotal = execStats.values.map(_.getOrElse("n_tasks", 0L)).sum
    val shuffleTotal =
      execStats.values.map(_.getOrElse("shuffle_write_bytes", 0L)).sum
    val workJson =
      f"""{"cpu_total_sec":$cpuTotal%.1f,"tasks_total":$tasksTotal,"shuffle_write_total_bytes":$shuffleTotal}"""
    // Drift arbitration vs a prior record: explicit via
    // SPARK_GRAFT_BENCH_BASELINE, else the most recent env-matched
    // QUIESCED record in the working directory (round-17 ask: the
    // last-written BENCH_DETAIL.json may be a contended raw record or
    // a different-parallelism probe — the committed quiesced anchors
    // are the decision-grade baselines), else BENCH_DETAIL.json.
    val baselinePath = sys.env.get("SPARK_GRAFT_BENCH_BASELINE")
      .orElse(if (keep.nonEmpty) None else defaultBaseline(cpus.toInt))
    val driftJson = baselinePath.flatMap(p => readBaseline(p).map(b =>
      driftVerdict(p, b, results.toMap, cpuStats.toMap, execStats.toMap,
        cpus.toInt)))
      .getOrElse("""{"verdict":"no-baseline"}""")
    val detail = line(fullJson, results.size, total).dropRight(1) +
      s""","work":$workJson,"drift":$driftJson,"reps":$repsJson,"cpu":$cpuJson,"exec":$execJson}"""
    // A filtered or conf-overlaid run is an iteration probe — never let
    // it clobber the committed full-suite record.
    if (keep.isEmpty && confOverlay.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
        (detail + "\n").getBytes("UTF-8"))

    // Greedy fill under the budget: priority names first (failed/-1
    // entries included — an invisible failure is worse than a long
    // line), then the remainder alphabetically.
    val byName = results.toMap
    val ordered = priority.filter(byName.contains) ++
      results.map(_._1).filterNot(priority.contains)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (name <- ordered) {
      val candidate = (picked :+ (name -> entry(name -> byName(name))))
      // budget with worst-case width for the n_shown/shown_sum fields
      if (line(candidate.map(_._2).mkString("{", ",", "}"), 9999, 99999.999)
          .length <= MaxLine)
        picked += (name -> entry(name -> byName(name)))
    }
    val shownSum = picked.map(p => byName(p._1)).filter(_ >= 0).sum
    // stop() BEFORE printing: nothing (not even shutdown logging that
    // might escape the stderr redirect) may trail the JSON line in the
    // driver's tail window.
    spark.stop()
    println(line(picked.map(_._2).mkString("{", ",", "}"),
      picked.size, shownSum))
  }
}
