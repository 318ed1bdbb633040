package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs the headline queries
  * on SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Methodology: one untimed warmup pass (JIT/codegen/parquet footer
  * caches), then one timed pass executing each plan with a noop write —
  * full distributed execution, nothing collected to the driver.
  */
object Bench {
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
    val qJson = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
