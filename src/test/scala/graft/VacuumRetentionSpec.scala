package graft

import java.nio.file.Files
import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Manifest, Upsert}

/** Reader retention vs vacuum (round-14 verdict item 2): a long-running
  * query planned on an old snapshot must not have its files deleted
  * mid-scan by a concurrent `vacuum` — the guarantee the reference
  * inherits from Postgres MVCC (a running query's pages are never
  * yanked). Two mechanisms, both in [[Manifest]]:
  *
  *  - [[Manifest.withSnapshotLease]] — an explicit per-reader pin,
  *    acquired under the commit lock so it can never race a vacuum's
  *    sweep; crash-safe via TTL expiry.
  *  - `vacuum(retainMillis = …)` — the Delta-style time floor: versions
  *    committed within the window survive regardless of keep-count.
  *
  * Plus the loud-refusal path: reading a retired version names vacuum
  * and the lease API instead of failing on a bare missing file.
  */
class VacuumRetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-ret").resolve("t").toString

  private val d1 = Date.valueOf("2024-07-01")

  private def threeVersions(): String = {
    val p = tmp()
    (1 to 3).foreach(i => Upsert.append(spark, p,
      Seq((i, d1, i * 100L)).toDF("k", "d", "cents"), Some("d")))
    assert(Manifest.versions(spark, p) === Seq(1L, 2L, 3L))
    p
  }

  test("a leased snapshot survives vacuum(keep=1) and completes its scan") {
    val p = threeVersions()
    Manifest.withSnapshotLease(spark, p, 1L) {
      // reader resolves its plan on v1 …
      val snapshot = Manifest.readAsOf(spark, p, 1L)
      // … a concurrent vacuum fires with the most aggressive policy …
      Manifest.vacuum(spark, p, keep = 1)
      // … v1's manifest AND files survive; the scan completes
      assert(Manifest.versions(spark, p).contains(1L))
      assert(snapshot.select("k").as[Int].collect().toSet === Set(1))
    }
    // lease released: the next vacuum retires v1 for real
    Manifest.vacuum(spark, p, keep = 1)
    assert(Manifest.versions(spark, p) === Seq(3L))
  }

  test("an expired pin (crashed reader) is swept and no longer protects") {
    val p = threeVersions()
    // plant an already-expired pin directly — what a dead reader leaves
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pin = new org.apache.hadoop.fs.Path(
      s"$p/_graft_manifest/_readers/r-crashed.pin")
    fs.mkdirs(pin.getParent)
    val out = fs.create(pin, true)
    out.write((s"v=1 expires=${System.currentTimeMillis() - 1000} " +
      "host=x pid=1").getBytes("UTF-8"))
    out.close()
    Manifest.vacuum(spark, p, keep = 1)
    assert(Manifest.versions(spark, p) === Seq(3L),
      "expired pin must not protect")
    assert(!fs.exists(pin), "vacuum sweeps expired pins")
  }

  test("retainMillis is a time floor: young versions survive keep=1") {
    val p = threeVersions()
    // all three versions were committed milliseconds ago
    val deleted = Manifest.vacuum(spark, p, keep = 1,
      retainMillis = 60L * 60 * 1000)
    assert(Manifest.versions(spark, p) === Seq(1L, 2L, 3L),
      "versions inside the retention window must survive")
    assert(deleted === 0)
    // with no floor, the same policy retires them
    Manifest.vacuum(spark, p, keep = 1)
    assert(Manifest.versions(spark, p) === Seq(3L))
  }

  test("reading or leasing a retired version refuses loudly") {
    val p = threeVersions()
    Manifest.vacuum(spark, p, keep = 1)
    val e = intercept[IllegalStateException](Manifest.readAsOf(spark, p, 1L))
    assert(e.getMessage.contains("vacuum"))
    assert(e.getMessage.contains("withSnapshotLease"))
    val e2 = intercept[IllegalArgumentException](
      Manifest.withSnapshotLease(spark, p, 1L)(fail("must not run")))
    assert(e2.getMessage.contains("retired"))
  }

  test("leases pin distinct versions independently under racing vacuums") {
    val p = threeVersions()
    Manifest.withSnapshotLease(spark, p, 1L) {
      Manifest.withSnapshotLease(spark, p, 2L) {
        Manifest.vacuum(spark, p, keep = 1)
        assert(Manifest.versions(spark, p) === Seq(1L, 2L, 3L))
      }
      Manifest.vacuum(spark, p, keep = 1)
      assert(Manifest.versions(spark, p) === Seq(1L, 3L))
      assert(Manifest.readAsOf(spark, p, 1L).count() === 1)
    }
  }
}
