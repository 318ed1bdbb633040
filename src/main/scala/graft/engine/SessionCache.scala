package graft.engine

import org.apache.spark.sql.SparkSession

/** The keyed-cache idiom used by the query layer, in ONE place: entries
  * are scoped to a live SparkSession (stopped sessions are evicted on
  * access, so the map never retains dead sessions or their blocks), and
  * callers put input-content fingerprints in the key so a changed
  * table (append, compaction) misses instead of serving stale plans.
  *
  * The two-part key form `(prefix, fingerprint)` additionally evicts the
  * SUPERSEDED entry when the same prefix re-inserts under a new
  * fingerprint — without it, a table rewritten mid-session would leave
  * its old persisted blocks cached until the session died (the map only
  * ever grew). `evict` receives the replaced value (pass `_.unpersist()`
  * for persisted DataFrames); entries inserted via the one-key overload
  * are their own prefix and are never evicted by other keys.
  */
final class SessionKeyedCache[V](evict: V => Unit = (_: V) => ()) {
  private val m =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), V]

  def getOrElseUpdate(s: SparkSession, key: String)(v: => V): V =
    getOrElseUpdate(s, key, "")(v)

  def getOrElseUpdate(s: SparkSession, prefix: String, fingerprint: String)(
      v: => V): V = synchronized {
    // synchronized: the miss→evict→insert sequence must be atomic, or
    // two concurrent first-inserts under different fingerprints would
    // each scan-before-the-other-lands and both entries would stay —
    // resurrecting the superseded-entry leak. Hits pay one uncontended
    // monitor acquire per query call; `v` (a plan build, not an
    // execution) is cheap enough to hold the lock over.
    m.keys.filter(_._1.sparkContext.isStopped).foreach(m.remove)
    m.get((s, prefix, fingerprint)) match {
      case Some(hit) => hit
      case None =>
        m.keys
          .filter(k => (k._1 eq s) && k._2 == prefix && k._3 != fingerprint)
          .foreach(k => m.remove(k).foreach(evict))
        m.getOrElseUpdate((s, prefix, fingerprint), v)
    }
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
