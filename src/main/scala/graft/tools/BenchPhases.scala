package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only measurement probe (optimization guide §1: measure first) —
  * NOT part of the driver contract; `graft.Bench` remains the official
  * record. For each (filtered) registered query this decomposes one
  * noop-sink execution into:
  *
  *   - `build`: wall of the `fn(spark, dir)` call — DataFrame/plan
  *     construction, including any driver-side metadata I/O the query
  *     does while composing (manifest GETs, footer reads);
  *   - `analysis`/`optimization`/`planning`: Catalyst phase wall from
  *     `QueryExecution.tracker` of the executed (noop-write) plan;
  *   - `exec`: wall of the write action minus the tracked phases —
  *     scheduling + task execution + AQE replanning rounds;
  *   - `task_sum`/`n_tasks`/`n_jobs`: executor-side totals from a
  *     listener, so (wall − task_sum/cores) exposes driver-bound time.
  *
  * Usage: SPARK_GRAFT_BENCH_FILTER=q_a,q_b sbt "runMain graft.tools.BenchPhases"
  * (unfiltered runs profile the whole bench set). One warmup pass runs
  * first so JIT/codegen/cache state matches Bench's timed pass.
  */
object BenchPhases {

  private final class JobTaskListener
      extends org.apache.spark.scheduler.SparkListener {
    @volatile var jobs = 0
    @volatile var tasks = 0
    @volatile var taskNanos = 0L
    @volatile var gcMs = 0L
    @volatile var fetchWaitMs = 0L
    @volatile var deserMs = 0L
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      synchronized { jobs += 1 }
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      synchronized {
        tasks += 1
        if (te.taskMetrics != null) {
          taskNanos += te.taskMetrics.executorRunTime * 1000000L
          gcMs += te.taskMetrics.jvmGCTime
          fetchWaitMs += te.taskMetrics.shuffleReadMetrics.fetchWaitTime
          deserMs += te.taskMetrics.executorDeserializeTime
        }
      }
    def reset(): Unit = synchronized {
      jobs = 0; tasks = 0; taskNanos = 0L; gcMs = 0L; fetchWaitMs = 0L
      deserMs = 0L
    }
  }

  /** Optional per-stage attribution (SPARK_GRAFT_PHASES_STAGES=1): one
    * stderr line per completed stage — tasks, summed task run time, and
    * the stage name/callsite — the "which operator owns the task time"
    * drill-down.
    */
  private final class StageDumpListener
      extends org.apache.spark.scheduler.SparkListener {
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val t = si.taskMetrics
      val rdds = si.rddInfos.map(_.name).filter(_ != null).distinct
        .mkString(">")
      System.err.println(
        f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"run=${if (t == null) -1 else t.executorRunTime}%6dms " +
          f"rdds=${rdds.take(120)}")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "64m")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // dev-only A/B hook: SPARK_GRAFT_BENCH_CONF="k=v;k=v" — lets a
    // config hypothesis be measured without a recompile
    val spark = sys.env.get("SPARK_GRAFT_BENCH_CONF")
      .map(_.split(";").map(_.trim).filter(_.contains("="))
        .foldLeft(b0) { (b, kv) =>
          val Array(k, v) = kv.split("=", 2); b.config(k, v)
        })
      .getOrElse(b0)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keep = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val qs = graft.SparkEntry.benchQueries.toSeq.sortBy(_._1)
      .filter { case (n, _) => keep.forall(_.contains(n)) }
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    qs.foreach { case (n, fn) =>
      try once(fn)
      catch { case e: Throwable =>
        System.err.println(s"[phases warmup] $n failed: ${e.getMessage}") }
    }
    val listener = new JobTaskListener
    spark.sparkContext.addSparkListener(listener)
    if (sys.env.get("SPARK_GRAFT_PHASES_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(new StageDumpListener)
    println(f"${"query"}%-34s ${"build"}%7s ${"ana"}%6s ${"opt"}%6s " +
      f"${"plan"}%6s ${"exec"}%7s ${"total"}%7s ${"tsum"}%7s jobs tasks " +
      f"${"gc"}%6s ${"fetchw"}%6s ${"deser"}%6s")
    qs.foreach { case (n, fn) =>
      System.gc()
      org.apache.spark.graftshim.CoreShims
        .drainListenerBus(spark.sparkContext)
      listener.reset()
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val writer = df.write.mode("overwrite").format("noop")
        writer.save()
        val t2 = System.nanoTime()
        org.apache.spark.graftshim.CoreShims
          .drainListenerBus(spark.sparkContext)
        // phase wall of the query's own analysis (the write re-plans on
        // top, but analysis of df's plan dominates)
        val ph = df.queryExecution.tracker.phases.map {
          case (k, s) => k -> (s.endTimeMs - s.startTimeMs) / 1e3
        }
        val build = (t1 - t0) / 1e9
        val exec = (t2 - t1) / 1e9
        println(f"$n%-34s $build%7.3f ${ph.getOrElse("analysis", 0.0)}%6.3f " +
          f"${ph.getOrElse("optimization", 0.0)}%6.3f " +
          f"${ph.getOrElse("planning", 0.0)}%6.3f $exec%7.3f " +
          f"${(t2 - t0) / 1e9}%7.3f ${listener.taskNanos / 1e9}%7.3f " +
          f"${listener.jobs}%4d ${listener.tasks}%5d " +
          f"${listener.gcMs / 1e3}%6.2f ${listener.fetchWaitMs / 1e3}%6.2f " +
          f"${listener.deserMs / 1e3}%6.2f")
      } catch { case e: Throwable =>
        println(s"$n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
