package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: per-query wall time at a given sf dir (names as args). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val byName = graft.SparkEntry.queries
    args.foreach { name =>
      val t0 = System.nanoTime()
      byName(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
