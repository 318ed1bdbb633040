package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Per-query plan-evidence files for the optimization rounds:
  * `.explain("formatted")` (and, when the third arg says `adaptive`,
  * additionally the executed final adaptive plan) for each named query,
  * one file per query at `<outDir>/<name>_<suffix>.txt`.
  *
  * Usage:
  *   sbt 'runMain graft.tools.PlanDump /root/testdata/sf0.1 plans/r18 before q_a,q_b'
  *
  * PLANS.md (graft.Plans) stays the whole-registry artifact; this one
  * exists so a round's touched queries get committed before/after
  * snapshots the judge can diff.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "64m")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val byName = graft.SparkEntry.registry.map(q => q.name -> q).toMap
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = byName(name).run(spark, sfDir)
      val sb = new StringBuilder
      sb.append(df.queryExecution
        .explainString(ExplainMode.fromString("formatted")))
      // executed final adaptive plan: the committed evidence for
      // exchange-reuse / AQE-coalescing claims the static plan can't show
      try {
        df.queryExecution.executedPlan.execute().foreach(_ => ())
        val p = df.queryExecution.executedPlan.toString
        if (p.contains("isFinalPlan=true")) {
          val stages = """ShuffleQueryStage (\d+)""".r
            .findAllMatchIn(p).map(_.group(1)).toSeq
          sb.append(s"\n\n== FINAL adaptive plan (executed) ==\n")
          sb.append(s"ShuffleQueryStage references: ${stages.size} total, " +
            s"${stages.distinct.size} distinct\n\n")
          sb.append(p)
        }
      } catch { case e: Throwable =>
        sb.append(s"\n\n(final adaptive plan unavailable: ${e.getMessage})\n")
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), sb.toString)
      System.err.println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
