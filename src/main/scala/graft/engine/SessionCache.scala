package graft.engine

import org.apache.spark.sql.SparkSession

/** The keyed-cache idiom used by the query layer, in ONE place: entries
  * are scoped to a live SparkSession (stopped sessions are evicted on
  * access, so the map never retains dead sessions or their blocks), and
  * callers put input-content fingerprints in the key so a changed
  * table (append, compaction) misses instead of serving stale plans.
  */
final class SessionKeyedCache[V] {
  private val m =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), V]

  def getOrElseUpdate(s: SparkSession, key: String)(v: => V): V = {
    m.keys.filter(_._1.sparkContext.isStopped).foreach(m.remove)
    m.getOrElseUpdate((s, key), v)
  }
}

object SessionKeyedCache {

  /** Content fingerprint of a file/directory: sorted (path, length,
    * mtime) triples. One cheap listing per query call buys cache
    * correctness under appends and compactions.
    */
  def fileFingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) s"absent:$path"
    else {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val f = it.next()
        buf += s"${f.getPath}:${f.getLen}:${f.getModificationTime}"
      }
      buf.sorted.mkString(";")
    }
  }
}
