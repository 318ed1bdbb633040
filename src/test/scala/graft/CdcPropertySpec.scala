package graft

import java.nio.file.Files
import java.sql.Date
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{ChangeFeed, Manifest, Upsert}

/** THE CDC property: for EVERY pair of committed versions (i, j),
  * `ChangeFeed.changes(i, j)` must equal the set difference of the two
  * snapshot reads — deletes with i's values, inserts with j's,
  * updates as both images — no matter WHICH mutation path produced
  * the versions. A seeded random program exercises every DML verb
  * (keyed upsert, SCD1 merge, dynamic partition overwrite, epoch
  * append, row delete, row update), then all O(V²) version pairs are
  * checked. This pins the feed to the snapshot semantics the rest of
  * the engine is tested against, instead of to per-verb expectations.
  */
class CdcPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dates =
    Seq("2024-07-01", "2024-07-02", "2024-07-03").map(Date.valueOf)

  private def df(rows: Seq[(Int, Date, Long)]) = rows.toDF("k", "d", "cents")

  // the table's UNIQUE key is (k, d) — the same k may legitimately
  // live on two dates (keyed upsert inserts new key TUPLES) — so both
  // the model and the feed key on it; the first draft of this spec
  // keyed on k alone and "found" a divergence that was actually the
  // model collapsing two live rows
  private def snap(p: String, v: Long): Map[(Int, Date), Long] =
    Manifest.readAsOf(spark, p, v).select("k", "d", "cents")
      .as[(Int, Date, Long)].collect()
      .map { case (k, d, c) => (k, d) -> c }.toMap

  private def expectedFeed(a: Map[(Int, Date), Long],
      b: Map[(Int, Date), Long]): Set[(Int, Date, Long, String)] = {
    val del = (a.keySet -- b.keySet).map(k =>
      (k._1, k._2, a(k), "delete"))
    val ins = (b.keySet -- a.keySet).map(k =>
      (k._1, k._2, b(k), "insert"))
    val upd = (a.keySet & b.keySet).filter(k => a(k) != b(k)).flatMap(k =>
      Seq((k._1, k._2, a(k), "update_preimage"),
        (k._1, k._2, b(k), "update_postimage")))
    (del ++ ins ++ upd).toSet
  }

  test("for every version pair, the feed equals the snapshot difference") {
    val p = Files.createTempDirectory("graft-cdc-prop").resolve("t").toString
    val rnd = new scala.util.Random(42)
    def rk() = rnd.nextInt(30)
    def rd() = dates(rnd.nextInt(dates.size))
    def rc() = (rnd.nextInt(900) + 100).toLong
    def rows(n: Int) = Seq.fill(n)((rk(), rd(), rc()))
      .groupBy(_._1).map(_._2.head).toSeq // one row per key

    // seed, then a random program over every DML verb
    Upsert.upsertPartitioned(spark, p, df(rows(10)), Seq("k", "d"), "d")
    var epoch = 0L
    (1 to 10).foreach { _ =>
      rnd.nextInt(5) match {
        case 0 => // keyed upsert: only new keys land
          Upsert.upsertPartitioned(spark, p, df(rows(4)), Seq("k", "d"), "d")
        case 1 => // SCD1 merge: replaces matches, inserts the rest
          Upsert.mergePartitioned(spark, p, df(rows(4)), Seq("k", "d"), "d")
        case 2 => // dynamic partition overwrite of one date
          val d = rd()
          Upsert.overwritePartitions(spark, p,
            df(rows(5).map { case (k, _, c) => (k, d, c) }), "d",
            expectedValues = Some(Seq(d.toString)))
        case 3 => // exactly-once epoch append: append has NO key
          // semantics, so appended keys must be globally unique or the
          // table would hold duplicate (k, d) rows the keyed model
          // (and any keyed CDC consumer) cannot express
          epoch += 1
          val fresh = (0 until 3).map(i =>
            (1000 + epoch.toInt * 10 + i, rd(), rc()))
          Upsert.appendEpoch(spark, p, df(fresh), Some("d"), "prop", epoch)
          ()
        case 4 => // row-level delete + update
          Upsert.deleteWhere(spark, p, col("k") === rk())
          Upsert.updateWhere(spark, p, col("k") === rk(),
            Map("cents" -> (col("cents") + lit(1L))))
          ()
      }
    }
    val vs = Manifest.versions(spark, p)
    assert(vs.size >= 10, s"program committed too few versions: $vs")
    val snaps = vs.map(v => v -> snap(p, v)).toMap
    // every pair, not just adjacent: net semantics must hold over any range
    for (i <- vs; j <- vs if i < j) {
      val got = ChangeFeed.changes(spark, p, i, j, Seq("k", "d"))
        .select("k", "d", "cents", ChangeFeed.ChangeCol)
        .as[(Int, Date, Long, String)].collect().toSet
      val want = expectedFeed(snaps(i), snaps(j))
      assert(got === want,
        s"feed ($i,$j] diverged from the snapshot difference")
    }
  }
}
