package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print the formatted physical plan of one registered query
  * (`Test/runMain graft.tools.PlanProbe <name> [sfDir]`).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    println("=== PLAN " + name + " ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
