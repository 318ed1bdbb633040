package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Small-file compaction — the warehouse-maintenance counterpart of the
  * daily upserts: every incremental append adds a few files per
  * partition, and at 100 TB the accumulated small files dominate task
  * scheduling and NameNode/listing costs. Rewrites a (optionally
  * date-partitioned) parquet table in place with files sized near the
  * target, via the same staged-swap discipline as the dim rewrites
  * (never delete before the replacement is fully written).
  */
object Compaction {

  /** Rewrite `path` with ~`targetBytesPerFile` files. Returns
    * (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String,
      partitionCol: Option[String] = None,
      targetBytesPerFile: Long = 128L * 1024 * 1024): (Long, Long) = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }

    val before = dataFiles(target)
    val totalBytes = before.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytesPerFile).toInt)

    val df = spark.read.parquet(path)
    val staging = new org.apache.hadoop.fs.Path(path + ".compact_staging")
    val writer = partitionCol match {
      case Some(c) =>
        // Hashing on the partition column ALONE would emit exactly one
        // file per partition value (one task writing a whole date — a
        // straggler at the daily-append regime this exists for). Add a
        // content-hash salt sized so each partition dir gets roughly
        // target-sized files.
        val nParts = math.max(1L, df.select(col(c)).distinct().count())
        val filesPerPart = math.max(1, math.ceil(nFiles.toDouble / nParts).toInt)
        val salt = pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(filesPerPart))
        df.repartition(nFiles, col(c), salt).write.partitionBy(c)
      case None => df.repartition(nFiles).write
    }
    writer.mode("overwrite").parquet(staging.toString)

    // Hadoop rename reports many failures by returning false, not
    // throwing — an unchecked swap could silently leave the staging copy
    // nested inside the live table, so every step is checked. If the
    // second rename fails, the parked `.old` is renamed BACK so the live
    // table never stays absent. A process crash exactly between the two
    // renames still leaves the table parked at `.old` (the same exposure
    // as any non-atomic two-rename swap on a plain FS); recovery is
    // `mv .old <path>` — both copies exist, nothing is lost.
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    fs.delete(old, true)
    if (!fs.rename(target, old)) {
      fs.delete(staging, true)
      throw new java.io.IOException(
        s"compaction swap failed: $target -> $old (target intact)")
    }
    if (!fs.rename(staging, target)) {
      fs.delete(staging, true)
      if (!fs.rename(old, target))
        throw new java.io.IOException(
          s"compaction swap failed AND restore failed — recover manually from $old")
      throw new java.io.IOException(
        s"compaction swap failed: $staging -> $target (previous restored)")
    }
    fs.delete(old, true)
    (before.size.toLong, dataFiles(target).size.toLong)
  }
}
