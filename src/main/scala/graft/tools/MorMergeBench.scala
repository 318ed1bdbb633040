package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Manifest, Upsert}

/** One-off measurement main for the round-18 merge-on-read MERGE —
  * the CDC-upsert-trickle shape ([[graft.engine.CdcSync]] feeds it):
  * few changed rows per file, many files, plus a handful of inserts.
  * Mirrors the round-17 DELETE measurement recorded in SCALE.md: same
  * sf0.1 lineitem slice, matched keys scattered so EVERY file is
  * touched (the COW worst case), identical result sets verified, wall
  * + bytes-written per mode printed as one JSON line.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     tools/run_graft.sh graft.tools.MorMergeBench
  */
object MorMergeBench {

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Bytes of every file the op added under the table (data files +
    * DV objects), from the live-set + pointer diff.
    */
  private def addedBytes(spark: SparkSession, p: String,
      preLive: Set[String], preDvRels: Set[String]): Long = {
    val fs = fsOf(spark, p)
    val v = Manifest.currentVersion(spark, p).get
    val newData = Manifest.filesAsOf(spark, p, v).toSet -- preLive
    val newDvs = Manifest.dvsAsOf(spark, p, v).values.map(_.rel).toSet --
      preDvRels
    (newData ++ newDvs).toSeq.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$p/$f")).getLen).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-mor-merge-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_mormerge"
    fsOf(spark, base).delete(new org.apache.hadoop.fs.Path(base), true)

    val slice = graft.engine.Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("k"),
        floor(col("l_extendedprice") * 100).cast("bigint").as("cents"))
      .select(col("k"), col("cents"))
    def seed(p: String): Unit = {
      Upsert.append(spark, p, slice.repartition(8), None)
      ()
    }
    // matched keys scattered across the whole key range -> every file
    // holds a few matches (the CDC trickle); plus a few fresh inserts
    val matchedKeys = slice.select(col("k"))
      .filter(pmod(col("k"), lit(7919)) === 0).distinct()
    val src = matchedKeys.withColumn("cents", lit(1L))
      .unionByName(spark.range(5).select(
        (col("id") - 100L).as("k"), lit(2L).as("cents")))

    def run(mode: String, p: String): (Double, Long, Long, Long) = {
      seed(p)
      spark.conf.set("spark.graft.dml.mode", mode)
      try {
        val preLive = Manifest.currentLive(spark, p).toSet
        val preDvs = Manifest.dvsAsOf(spark, p,
          Manifest.currentVersion(spark, p).get).values.map(_.rel).toSet
        val t0 = System.nanoTime()
        val (matched, inserted) = Upsert.mergeProgram(spark, p, src,
          Seq("k"), Seq(Upsert.MatchedUpdate(None)), Seq.empty,
          Some(Upsert.InsertSpec(None)), Seq.empty)
        val wall = (System.nanoTime() - t0) / 1e9
        (wall, addedBytes(spark, p, preLive, preDvs), matched, inserted)
      } finally spark.conf.unset("spark.graft.dml.mode")
    }

    val (wCow, bCow, mCow, iCow) = run("copy-on-write", s"$base/cow")
    val (wMor, bMor, mMor, iMor) = run("merge-on-read", s"$base/mor")
    // identical results (row-set equality) is part of the measurement
    val diff = Manifest.read(spark, s"$base/cow")
      .exceptAll(Manifest.read(spark, s"$base/mor")).count() +
      Manifest.read(spark, s"$base/mor")
        .exceptAll(Manifest.read(spark, s"$base/cow")).count()
    println(
      f"""{"matched":$mCow,"inserted":$iCow,"rows_equal":${diff == 0L},"cow":{"wall_sec":$wCow%.1f,"bytes_written":$bCow},"mor":{"wall_sec":$wMor%.1f,"bytes_written":$bMor},"write_ratio":${bCow / math.max(1L, bMor)},"matched_mor":$mMor,"inserted_mor":$iMor}""")
    spark.stop()
  }
}
