package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** A second writer raced the single-writer warehouse contract: the
  * table's lease file names the holder. Fail-loud by design — the
  * reference serializes writers externally (Airflow sensors), and a
  * silent interleave of two staged swaps can lose rows.
  */
final class ConcurrentWriterException(msg: String)
  extends RuntimeException(msg)

/** Enforced single-writer lease for warehouse mutations.
  *
  * The reference's warehouse inherits Postgres MVCC, so two concurrent
  * `INSERT ... ON CONFLICT` writers are merely serialized
  * (`transformed_from_s3_to_pg.py:143-152` runs inside a transaction).
  * A parquet directory has no such referee: [[Upsert]]'s staged
  * append/merge is correct under the reference's own single-writer
  * discipline but nothing ENFORCED it — until here. Every mutating
  * publish path acquires `<table>.__writer_lease` for its duration;
  * a second concurrent writer fails immediately and loudly with the
  * holder's identity instead of silently interleaving half-applied
  * swaps.
  *
  * Mechanics: `FileSystem.create(path, overwrite = false)` — atomic
  * exclusive create on HDFS and HDFS-like stores (and on S3 since
  * conditional writes; best-effort check-then-create on the local
  * RawLocalFileSystem, which is fine for tests and single-host runs).
  * The lease carries holder host/pid/time for the diagnostic. Released
  * in `finally`; a writer that DIES leaves the lease behind on purpose
  * — a crashed staged swap needs a human (or orchestrator retry policy)
  * to look before the next write proceeds. [[breakLease]] is the
  * explicit recovery step, mirroring the reference's manual Airflow
  * task-clear.
  */
object WriterLease {

  /** Run `body` holding the exclusive writer lease for `tablePath`.
    * @throws ConcurrentWriterException when another writer holds it
    */
  def withLease[A](spark: SparkSession, tablePath: String)(body: => A): A = {
    val lease = leasePath(tablePath)
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (lease.getParent != null) fs.mkdirs(lease.getParent)
    val holder = s"host=${java.net.InetAddress.getLocalHost.getHostName} " +
      s"pid=${ProcessHandle.current.pid} " +
      s"acquired=${java.time.Instant.now}"
    val out =
      try fs.create(lease, false)
      catch {
        case e: java.io.IOException =>
          val existing =
            try {
              val in = fs.open(lease)
              try new String(in.readAllBytes(), "UTF-8").trim
              finally in.close()
            } catch { case _: java.io.IOException => "<unreadable>" }
          throw new ConcurrentWriterException(
            s"another writer holds the lease for $tablePath ($existing); " +
              s"single-writer contract violated — if that writer crashed, " +
              s"inspect the table and WriterLease.breakLease it " +
              s"(${e.getMessage})")
      }
    try out.write(holder.getBytes("UTF-8"))
    finally out.close()
    try body
    finally fs.delete(lease, false)
  }

  /** Explicit recovery from a crashed writer: remove the stale lease
    * after inspecting the table. Returns true iff a lease was removed.
    */
  def breakLease(spark: SparkSession, tablePath: String): Boolean = {
    val lease = leasePath(tablePath)
    lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(lease, false)
  }

  private def leasePath(tablePath: String) =
    new Path(tablePath + ".__writer_lease")
}
