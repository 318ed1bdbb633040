package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for q_setsim_join's sub-plans (not a test; run via
  * `Test/runMain graft.tools.SetsimProbe`). Times each stage of the
  * PPJoin pipeline in isolation to locate the dominant cost.
  */
object SetsimProbe {
  def time(name: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the query's real tokenizer (incl. its empty-token filter) — a
    // local re-implementation would profile a different relation
    def words(c: org.apache.spark.sql.Column) =
      graft.functions.TextFunctions.words(c)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val tri = docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"),
        graft.functions.WordShingles(col("ws"), 3).as("ts"))
      .persist()
    time("tri_materialize")(noop(tri))
    println("docs with >=3 words: " + tri.count())
    time("tri_again_cached")(noop(tri))

    val toks = tri.select(col("doc_id"),
      size(col("ts")).cast("long").as("len"), explode(col("ts")).as("tok"))
    time("toks_explode")(noop(toks))
    println("toks rows: " + toks.count())

    val dfc = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    time("dfc_agg")(noop(dfc))
    println("distinct trigrams: " + dfc.count())

    val joined = toks.join(dfc, Seq("tok"))
    time("toks_join_dfc")(noop(joined))

    val ranked = joined.withColumn("pos", row_number().over(
      Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
    time("ranked_window")(noop(ranked))

    val p = col("len") -
      call_function("div", lit(3L) * col("len") + 4, lit(5L)) + 1
    val pref = ranked.filter(col("pos") <= p)
      .select(col("tok"), col("doc_id"), col("len"))
    time("prefix")(noop(pref))
    println("prefix rows: " + pref.count())

    val cand = pref.select(col("tok"), col("doc_id").as("doc_a"),
        col("len").as("len_a"))
      .join(pref.select(col("tok"), col("doc_id").as("doc_b"),
        col("len").as("len_b")), Seq("tok"))
      .filter(col("doc_a") < col("doc_b") &&
        lit(5L) * least(col("len_a"), col("len_b")) >=
          lit(3L) * greatest(col("len_a"), col("len_b")))
      .select(col("doc_a"), col("doc_b"), col("len_a"), col("len_b"))
      .distinct()
    time("cand_selfjoin")(noop(cand))
    println("cand rows: " + cand.count())

    val inter = cand
      .join(broadcast(tri.select(col("doc_id").as("doc_a"), col("ts").as("ta"))),
        Seq("doc_a"))
      .join(broadcast(tri.select(col("doc_id").as("doc_b"), col("ts").as("tb"))),
        Seq("doc_b"))
      .withColumn("inter",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(lit(8L) * col("inter") >= lit(3L) * (col("len_a") + col("len_b")))
    time("verify_broadcast")(noop(inter))

    val interNoHint = cand
      .join(tri.select(col("doc_id").as("doc_a"), col("ts").as("ta")),
        Seq("doc_a"))
      .join(tri.select(col("doc_id").as("doc_b"), col("ts").as("tb")),
        Seq("doc_b"))
      .withColumn("inter",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(lit(8L) * col("inter") >= lit(3L) * (col("len_a") + col("len_b")))
    time("verify_aqe_nohint")(noop(interNoHint))

    spark.stop()
  }
}
