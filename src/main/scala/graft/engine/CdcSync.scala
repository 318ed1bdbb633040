package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit

/** Maintain a JDBC replica of a manifest-managed table from its change
  * feed — the reference's architecture inverted: there every consumer
  * polls Postgres because Postgres IS the warehouse; here the warehouse
  * is partitioned parquet at 100 TB scale, and the row-store serves the
  * consumers that genuinely need one (dashboards, lookups), maintained
  * incrementally with exactly-once delivery.
  *
  * Each sync reads the replica's own transactional offset
  * ([[JdbcSink.readOffset]] — the source of truth, NOT a file-side
  * bookmark, because net-change application is only valid against the
  * exact snapshot the replica is at), computes the net feed
  * (offset, currentVersion] with [[ChangeFeed.changes]] — O(changed
  * files) I/O — and applies it via [[JdbcSink.applyChanges]], which
  * CASes the offset forward in the SAME transaction as the rows. A
  * crash anywhere leaves both or neither; a replayed range is a
  * detected no-op; racing syncs serialize on the offset row's primary
  * key. First sync (no offset) seeds the replica with the full current
  * snapshot as `insert` rows.
  */
object CdcSync {

  /** What one sync did: the version range walked and whether this call
    * applied it (false = someone already had). */
  final case class Synced(fromVersion: Option[Long], toVersion: Long,
      applied: Boolean)

  def syncReplica(spark: SparkSession, path: String, keyCols: Seq[String],
      url: String, table: String,
      props: java.util.Properties = new java.util.Properties,
      maxRows: Int = 1 << 20): Synced = {
    val vTo = Manifest.currentVersion(spark, path).getOrElse(
      throw new IllegalStateException(
        s"CDC sync needs a manifest-managed source: $path has no " +
          "committed version"))
    val offset = JdbcSink.readOffset(url, table, props)
    if (offset.exists(_ >= vTo)) Synced(offset, vTo, applied = false)
    else {
      val feed = offset match {
        case Some(v) => ChangeFeed.changes(spark, path, v, vTo, keyCols)
        case None => Manifest.readAsOf(spark, path, vTo)
          .withColumn(ChangeFeed.ChangeCol, lit("insert"))
      }
      val applied = JdbcSink.applyChanges(feed, url, table, keyCols,
        offset, vTo, props, maxRows)
      Synced(offset, vTo, applied)
    }
  }
}
