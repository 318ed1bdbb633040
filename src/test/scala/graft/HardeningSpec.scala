package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{ChangeFeed, Manifest, Upsert}

/** Regression coverage for the round-14 adversarial-review findings:
  * edge states and crash windows on the new surfaces that the happy-path
  * specs didn't reach.
  */
class HardeningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d1 = Date.valueOf("2024-07-01")
  private def tmp(): String =
    Files.createTempDirectory("graft-hard").resolve("t").toString
  private def fsOf(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("change feed of an empty CREATE TABLE'd shell is a typed empty " +
      "feed, not a crash; the consumer offset still advances") {
    val p = tmp()
    val st = StructType(Seq(StructField("k", IntegerType),
      StructField("d", DateType), StructField("cents", LongType)))
    Manifest.commit(spark, p, Seq.empty, schema = Some(st))
    var delivered = -1L
    var cols: Seq[String] = Seq.empty
    val range = ChangeFeed.consumeNew(spark, p, Seq("k", "d"), "c1") { b =>
      delivered = b.count(); cols = b.columns.toSeq
    }
    assert(range === Some((0L, 1L)))
    assert(delivered === 0L)
    assert(cols === Seq("k", "d", "cents", ChangeFeed.ChangeCol))
    // offset advanced: replay delivers nothing; a real insert delivers
    assert(ChangeFeed.consumeNew(spark, p, Seq("k", "d"), "c1")(_ => ())
      .isEmpty)
    Upsert.append(spark, p, Seq((1, d1, 10L)).toDF("k", "d", "cents"),
      Some("d"))
    var types: Seq[String] = Seq.empty
    ChangeFeed.consumeNew(spark, p, Seq("k", "d"), "c1") { b =>
      types = b.select(ChangeFeed.ChangeCol).as[String].collect().toSeq
    }
    assert(types === Seq("insert"))
  }

  test("a crash between offset delete and rename recovers from the tmp " +
      "file instead of replaying the whole snapshot") {
    val p = tmp()
    Upsert.append(spark, p, Seq((1, d1, 10L)).toDF("k", "d", "cents"),
      Some("d"))
    ChangeFeed.seekConsumer(spark, p, "c2", 1L)
    // simulate the crash window: the NEW offset sits in .tmp, the main
    // file was already deleted
    val fs = fsOf(p)
    val main = new org.apache.hadoop.fs.Path(
      s"$p/_graft_manifest/_consumer_c2.offset")
    val t = new org.apache.hadoop.fs.Path(main.getParent,
      main.getName + ".tmp")
    val out = fs.create(t, true)
    out.write("1".getBytes("UTF-8")); out.close()
    fs.delete(main, false)
    assert(ChangeFeed.consumerOffset(spark, p, "c2") === Some(1L))
    // caught up at v1: nothing re-delivered
    assert(ChangeFeed.consumeNew(spark, p, Seq("k", "d"), "c2")(_ =>
      fail("must not re-deliver")).isEmpty)
  }

  test("an EMPTY orphaned commit lock (holder died mid-write) is broken " +
      "and commits proceed") {
    val p = tmp()
    Upsert.append(spark, p, Seq((1, d1, 10L)).toDF("k", "d", "cents"),
      Some("d"))
    val fs = fsOf(p)
    val lock = new org.apache.hadoop.fs.Path(
      s"$p/_graft_manifest/_commit.lock")
    fs.create(lock, true).close() // zero bytes — unattributable
    Upsert.append(spark, p, Seq((2, d1, 20L)).toDF("k", "d", "cents"),
      Some("d"))
    assert(Manifest.read(spark, p).count() === 2)
  }

  test("merge with a source column literally named 'matched' does not " +
      "collide with the match sentinel") {
    val p = tmp()
    Upsert.append(spark, p, Seq((1L, 10L, false), (2L, 20L, false))
      .toDF("k", "cents", "matched"), None)
    val src = Seq((2L, 999L, true), (5L, 50L, true))
      .toDF("k", "cents", "matched")
    val (affected, inserted) = Upsert.mergeActions(spark, p, src, Seq("k"),
      Seq(Upsert.MatchedUpdate(None)), Some(None), Seq.empty)
    assert(affected === 1L && inserted === 1L)
    val rows = Manifest.read(spark, p).select("k", "cents")
      .as[(Long, Long)].collect().toMap
    assert(rows === Map(1L -> 10L, 2L -> 999L, 5L -> 50L))
  }

  test("an unparseable reader pin (reader died mid-write) is swept by " +
      "vacuum and does not protect anything") {
    val p = tmp()
    (1 to 3).foreach(i => Upsert.append(spark, p,
      Seq((i, d1, i * 1L)).toDF("k", "d", "cents"), Some("d")))
    val fs = fsOf(p)
    val junk = new org.apache.hadoop.fs.Path(
      s"$p/_graft_manifest/_readers/r-junk.pin")
    fs.mkdirs(junk.getParent)
    val out = fs.create(junk, true)
    out.write("v=".getBytes("UTF-8")); out.close() // truncated
    Manifest.vacuum(spark, p, keep = 1)
    assert(Manifest.versions(spark, p) === Seq(3L))
    assert(!fs.exists(junk), "junk pins must be swept")
  }
}
