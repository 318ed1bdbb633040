package graft

import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Manifest, Upsert}

/** Exactly-once streaming append into manifest tables
  * ([[graft.engine.Upsert.appendEpoch]] + manifest txn markers): a
  * replayed (appId, batchId) is a one-metadata-read no-op, markers
  * carry forward across other writers' commits, apps are independent,
  * empty epochs are recorded, and the end-to-end streaming sink lands
  * every MemoryStream batch once.
  */
class AppendEpochSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-epoch").resolve("t").toString

  private val d1 = Date.valueOf("2024-07-01")

  private def rows(rs: (Int, Date)*) = rs.toDF("v", "d")

  private def count(path: String): Long = Manifest.read(spark, path).count()

  test("a replayed batch is skipped; lower batchIds too; apps are independent") {
    val p = tmp()
    assert(Upsert.appendEpoch(spark, p, rows((1, d1)), Some("d"), "appA", 0L))
    assert(count(p) === 1)
    // exact replay: detected, nothing written, no new version
    val v = Manifest.currentVersion(spark, p).get
    assert(!Upsert.appendEpoch(spark, p, rows((1, d1)), Some("d"), "appA", 0L))
    assert(count(p) === 1 && Manifest.currentVersion(spark, p) === Some(v))
    // a LATER batch lands; an out-of-order earlier one is skipped
    assert(Upsert.appendEpoch(spark, p, rows((2, d1)), Some("d"), "appA", 3L))
    assert(!Upsert.appendEpoch(spark, p, rows((9, d1)), Some("d"), "appA", 2L))
    assert(count(p) === 2)
    // a different app has its own ledger
    assert(Upsert.appendEpoch(spark, p, rows((3, d1)), Some("d"), "appB", 0L))
    assert(count(p) === 3)
    assert(Manifest.lastTxn(spark, p, "appA") === Some(3L))
    assert(Manifest.lastTxn(spark, p, "appB") === Some(0L))
  }

  test("markers carry forward across other writers' commits") {
    val p = tmp()
    assert(Upsert.appendEpoch(spark, p, rows((1, d1)), Some("d"), "appA", 7L))
    // an unrelated keyed upsert commits in between
    Upsert.upsertPartitioned(spark, p, rows((50, d1)), Seq("v", "d"), "d")
    assert(Manifest.lastTxn(spark, p, "appA") === Some(7L))
    assert(!Upsert.appendEpoch(spark, p, rows((1, d1)), Some("d"), "appA", 7L))
  }

  test("an empty epoch records its marker once the table exists") {
    val p = tmp()
    assert(Upsert.appendEpoch(spark, p, rows((1, d1)), Some("d"), "appA", 0L))
    assert(Upsert.appendEpoch(spark, p, rows(), Some("d"), "appA", 1L))
    assert(Manifest.lastTxn(spark, p, "appA") === Some(1L))
    assert(count(p) === 1)
  }

  test("the streaming sink lands every batch exactly once") {
    val p = tmp()
    val ckpt = Files.createTempDirectory("graft-epoch-ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Int]
    in.addData(1, 2, 3)
    val events = in.toDF().select(
      $"value".as("v"), org.apache.spark.sql.functions.lit(d1).as("d"))
    val q1 = graft.streaming.GraftStreaming.appendLogStream(
      events, p, "d", "evlog", ckpt)
    q1.awaitTermination()
    assert(count(p) === 3)
    // same checkpoint, new data: only the new batch lands
    in.addData(4, 5)
    val q2 = graft.streaming.GraftStreaming.appendLogStream(
      events, p, "d", "evlog", ckpt)
    q2.awaitTermination()
    assert(count(p) === 5)
    assert(Manifest.read(spark, p).select("v").as[Int].collect().sorted
      === Array(1, 2, 3, 4, 5))
  }
}
