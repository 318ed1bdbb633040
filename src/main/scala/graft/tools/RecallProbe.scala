package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure IVF-PQ recall@k against the exact cosine top-k on any data
  * directory, across a set of multiprobe widths — the tool behind the
  * recall-vs-nprobe curves recorded in SCALE.md (round-14 verdict item
  * 7: assert recall beyond the committed testdata scales, e.g. on the
  * 10× sweep's entity-scaled embeddings).
  *
  *   tools/run_graft.sh graft.tools.RecallProbe <dir> [nprobes=1,2,3,4]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nprobes = args.lift(1).getOrElse("1,2,3,4")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.engine.Tables.t(spark, dir, "embeddings").count()
    val exact = graft.queries.VectorQueries.qCosineTopk.run(spark, dir)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val curve = nprobes.map { np =>
      val got = graft.queries.VectorQueries.ivfpqTopkDf(spark, dir, np)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      np -> got.count(exact.contains).toDouble / exact.size
    }
    println(s"""{"dir":"$dir","vectors":$n,"recall_at_3":{""" +
      curve.map { case (np, r) =>
        s""""$np":${String.format(java.util.Locale.ROOT, "%.4f",
          java.lang.Double.valueOf(r))}""" }
        .mkString(",") + "}}")
    spark.stop()
  }
}
