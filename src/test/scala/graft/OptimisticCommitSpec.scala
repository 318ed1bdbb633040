package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{CommitConflictException, Manifest, Upsert}

/** Optimistic concurrent commits (round 13): blind appends take no
  * writer lease and compose with everything; file-rewriting verbs
  * validate their snapshot basis AT COMMIT TIME and rebuild the live
  * set from the then-current snapshot, so a concurrent append's files
  * are never dropped; a genuine basis conflict throws
  * [[CommitConflictException]] and the library verbs recompute. The
  * reference gets all of this from Postgres MVCC — two `INSERT … ON
  * CONFLICT` writers merely serialize (`docker-compose.yaml:44`); this
  * is the parquet-snapshot restatement.
  */
class OptimisticCommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-occ").resolve("t").toString

  private val d1 = Date.valueOf("2024-07-01")
  private val d2 = Date.valueOf("2024-07-02")

  private def inThreads[T](fs: Seq[() => T]): Seq[Either[Throwable, T]] = {
    val out = new Array[Either[Throwable, T]](fs.size)
    val ts = fs.zipWithIndex.map { case (f, i) =>
      new Thread(() => out(i) = try Right(f()) catch {
        case e: Throwable => Left(e)
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    out.toSeq
  }

  test("two concurrent appends both land on a linear version history") {
    val p = tmp()
    // first commit creates the manifest (adoption is single-writer)
    Upsert.append(spark, p, Seq((0, d1, 0L)).toDF("k", "d", "cents"), Some("d"))
    val v0 = Manifest.currentVersion(spark, p).get
    val results = inThreads(Seq(
      () => Upsert.append(spark, p,
        Seq((1, d1, 100L), (2, d1, 200L)).toDF("k", "d", "cents"), Some("d")),
      () => Upsert.append(spark, p,
        Seq((3, d2, 300L)).toDF("k", "d", "cents"), Some("d"))))
    assert(results.forall(_.isRight), s"appends failed: $results")
    assert(Manifest.currentVersion(spark, p).get === v0 + 2)
    assert(Manifest.versions(spark, p) === (1L to (v0 + 2)))
    val rows = Manifest.read(spark, p).select("k").as[Int].collect().toSet
    assert(rows === Set(0, 1, 2, 3))
  }

  test("many concurrent appenders: every batch lands exactly once") {
    val p = tmp()
    Upsert.append(spark, p, Seq((0, d1, 0L)).toDF("k", "d", "cents"), Some("d"))
    val n = 8
    val results = inThreads((1 to n).map(i => () =>
      Upsert.append(spark, p,
        Seq((i, if (i % 2 == 0) d1 else d2, i * 100L))
          .toDF("k", "d", "cents"), Some("d"))))
    assert(results.forall(_ == Right(1L)), s"appends failed: $results")
    val t = Manifest.read(spark, p)
    assert(t.count() === n + 1L)
    assert(t.agg(org.apache.spark.sql.functions.sum("cents")).as[Long]
      .head() === (1 to n).map(_ * 100L).sum)
    assert(Manifest.currentVersion(spark, p).get === n + 1L)
  }

  test("a rewrite prepared against a stale basis conflicts; recompute lands") {
    val p = tmp()
    Upsert.upsertPartitioned(spark, p,
      Seq((1, d1, 100L), (2, d2, 200L)).toDF("k", "d", "cents"),
      Seq("k", "d"), "d")
    val v1 = Manifest.currentVersion(spark, p).get
    val d1Files = Manifest.filesAsOf(spark, p, v1)
      .filter(_.startsWith("d=2024-07-01/")).toSet
    // writer B prepares a wholesale replacement of partition d1 at v1 …
    val prepared = Manifest.PreparedCommit(
      scope = f => f.startsWith("d=2024-07-01/"),
      expected = d1Files, retire = d1Files, add = Seq.empty)
    // … while writer A appends INTO d1 first
    Upsert.append(spark, p, Seq((9, d1, 900L)).toDF("k", "d", "cents"),
      Some("d"))
    val e = intercept[CommitConflictException](
      Manifest.commitOptimistic(spark, p, prepared))
    assert(e.getMessage.contains("recompute"))
    // nothing landed: the table still has all three rows
    assert(Manifest.read(spark, p).count() === 3)
    // the recompute (fresh basis) commits cleanly — exactly one retry
    val vNow = Manifest.currentVersion(spark, p).get
    val freshD1 = Manifest.filesAsOf(spark, p, vNow)
      .filter(_.startsWith("d=2024-07-01/")).toSet
    assert(Manifest.commitOptimistic(spark, p, prepared.copy(
      expected = freshD1, retire = freshD1)).isDefined)
    assert(Manifest.read(spark, p).select("k").as[Int].collect().toSet
      === Set(2))
  }

  test("a delete's commit preserves files a concurrent append landed") {
    val p = tmp()
    Upsert.upsertPartitioned(spark, p,
      Seq((1, d1, 100L), (2, d2, 200L)).toDF("k", "d", "cents"),
      Seq("k", "d"), "d")
    val v = Manifest.currentVersion(spark, p).get
    val touched = Manifest.filesAsOf(spark, p, v)
      .filter(_.startsWith("d=2024-07-01/")).toSet
    // append lands AFTER the delete computed its touched set (outside
    // its scope: a different partition)
    Upsert.append(spark, p, Seq((5, d2, 500L)).toDF("k", "d", "cents"),
      Some("d"))
    // delete commits against its (still-valid) basis
    assert(Manifest.commitOptimistic(spark, p, Manifest.PreparedCommit(
      scope = touched, expected = touched, retire = touched,
      add = Seq.empty)).isDefined)
    // the appended row SURVIVED the delete's commit
    assert(Manifest.read(spark, p).select("k").as[Int].collect().toSet
      === Set(2, 5))
  }

  test("leased merge (runDaily shape) and lease-less appends (log stream " +
      "shape) run concurrently into one table") {
    val p = tmp()
    Upsert.upsertPartitioned(spark, p,
      (1 to 50).map(i => (i, d1, i * 10L)).toDF("k", "d", "cents"),
      Seq("k", "d"), "d")
    // thread A: three keyed merges into d1 (upsert semantics, leased);
    // thread B: five blind appends of NEW keys into d2 (lease-less)
    val results = inThreads(Seq(
      () => {
        (1 to 3).foreach { r =>
          Upsert.mergePartitioned(spark, p,
            (1 to 50).map(i => (i, d1, i * 10L + r)).toDF("k", "d", "cents"),
            Seq("k", "d"), "d")
        }
        "merges-done"
      },
      () => {
        (1 to 5).foreach { i =>
          Upsert.append(spark, p,
            Seq((1000 + i, d2, 7L)).toDF("k", "d", "cents"), Some("d"))
        }
        "appends-done"
      }))
    assert(results.forall(_.isRight), s"concurrent writers failed: $results")
    val t = Manifest.read(spark, p)
    // 50 merged keys (last merge's values) + 5 appended keys, none lost
    assert(t.count() === 55)
    assert(t.filter(col("k") > 1000).count() === 5)
    assert(t.filter(col("d") === d1)
      .agg(org.apache.spark.sql.functions.sum("cents")).as[Long].head()
      === (1 to 50).map(_ * 10L + 3).sum)
  }

  test("appendEpoch: two racing replayers of one epoch land it exactly once") {
    val p = tmp()
    Upsert.append(spark, p, Seq((0, d1, 0L)).toDF("k", "d", "cents"), Some("d"))
    val batch = Seq((1, d1, 111L)).toDF("k", "d", "cents")
    val results = inThreads(Seq(
      () => Upsert.appendEpoch(spark, p, batch, Some("d"), "appA", 7L),
      () => Upsert.appendEpoch(spark, p, batch, Some("d"), "appA", 7L)))
    val committed = results.collect { case Right(true) => 1 }.sum
    assert(results.forall(_.isRight), s"epoch appenders failed: $results")
    assert(committed === 1,
      s"exactly one replayer must win the epoch, got $committed ($results)")
    assert(Manifest.read(spark, p).filter(col("k") === 1).count() === 1)
    // and a later replay is the cheap pre-check no-op
    assert(!Upsert.appendEpoch(spark, p, batch, Some("d"), "appA", 7L))
  }

  test("vacuum racing lease-less appends never deletes a staged batch " +
      "(stage-in rides inside the commit lock)") {
    val p = tmp()
    Upsert.append(spark, p, Seq((0, d1, 0L)).toDF("k", "d", "cents"),
      Some("d"))
    // interleave appends with aggressive vacuums: before round 13's
    // in-lock stage-in, a vacuum sweeping between an append's rename-in
    // and its commit would delete the batch's files as dead and the
    // commit would reference vanished files
    val results = inThreads(Seq(
      () => {
        (1 to 12).foreach(i => Upsert.append(spark, p,
          Seq((i, d1, i * 1L)).toDF("k", "d", "cents"), Some("d")))
        "appends-done"
      },
      () => {
        (1 to 12).foreach { _ =>
          Manifest.vacuum(spark, p, keep = 1); Thread.sleep(5)
        }
        "vacuums-done"
      }))
    assert(results.forall(_.isRight), s"racers failed: $results")
    // every appended row is present AND readable (no dangling refs)
    val t = Manifest.read(spark, p)
    assert(t.count() === 13)
    assert(t.agg(org.apache.spark.sql.functions.sum("cents")).as[Long]
      .head() === (1 to 12).map(_.toLong).sum)
  }

  test("compaction keeps a concurrently appended file instead of dropping it") {
    val p = tmp()
    (1 to 4).foreach(i => Upsert.append(spark, p,
      Seq((i, d1, i * 1L)).toDF("k", "d", "cents"), Some("d")))
    // simulate an append landing between compaction's snapshot pin and
    // its commit: prepare compaction's basis, land an append, then
    // commit the compaction optimistically (what Compaction.compact does)
    val v = Manifest.currentVersion(spark, p).get
    val basis = Manifest.filesAsOf(spark, p, v).toSet
    Upsert.append(spark, p, Seq((99, d1, 99L)).toDF("k", "d", "cents"),
      Some("d"))
    // "compacted" output: reuse the basis files as a stand-in add set is
    // not possible (names must be fresh) — an empty rewrite models the
    // live-set arithmetic that matters here
    assert(Manifest.commitOptimistic(spark, p, Manifest.PreparedCommit(
      scope = basis, expected = basis, retire = basis,
      add = Seq.empty)).isDefined)
    // the concurrent append's row survived the whole-basis retirement
    assert(Manifest.read(spark, p).select("k").as[Int].collect().toSet
      === Set(99))
  }
}
