package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

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
      // repartition by the partition column so each output partition dir
      // gets coalesced files rather than nFiles slivers per partition
      case Some(c) => df.repartition(nFiles, col(c)).write.partitionBy(c)
      case None => df.repartition(nFiles).write
    }
    writer.mode("overwrite").parquet(staging.toString)

    val old = new org.apache.hadoop.fs.Path(path + ".old")
    fs.delete(old, true)
    fs.rename(target, old)
    fs.rename(staging, target)
    fs.delete(old, true)
    (before.size.toLong, dataFiles(target).size.toLong)
  }
}
