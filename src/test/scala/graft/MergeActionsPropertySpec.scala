package graft

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Manifest, Upsert}

/** THE generalized-merge property: for ANY target table, source batch,
  * and ordered clause list, [[Upsert.mergeActions]] must equal the
  * row-by-row reference semantics of SQL MERGE — per matched target
  * row, the FIRST clause whose condition holds applies (update = the
  * full source row, delete = drop); unmatched target rows survive;
  * unmatched source rows insert iff the insert clause exists and its
  * condition holds. A seeded random program generates tables, sources
  * (unique keys), and clause sets over a small condition grammar, and
  * diffs the engine's committed snapshot against an in-memory model —
  * the same randomized-differential discipline that pinned PageRank and
  * the CDC feed in earlier rounds.
  */
class MergeActionsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // condition grammar over the combined row: target cents (plain name)
  // vs source cents (__src_), and absolute thresholds on either side
  private type Cond = (Long, Long) => Boolean // (targetCents, srcCents)
  private def conds(rnd: scala.util.Random): (Option[Column], Option[Cond]) =
    rnd.nextInt(5) match {
      case 0 => (None, None) // unconditional
      case 1 => (Some(col("__src_cents") > col("cents")),
        Some((t, s) => s > t))
      case 2 => (Some(col("__src_cents") < col("cents")),
        Some((t, s) => s < t))
      case 3 =>
        val th = rnd.nextInt(900) + 100
        (Some(col("cents") >= th), Some((t, _) => t >= th))
      case 4 =>
        val th = rnd.nextInt(900) + 100
        (Some(col("__src_cents") >= th), Some((_, s) => s >= th))
    }

  // insert conditions may reference ONLY the source side
  private def insConds(rnd: scala.util.Random)
      : (Option[Column], Long => Boolean) =
    rnd.nextInt(3) match {
      case 0 => (None, _ => true)
      case 1 =>
        val th = rnd.nextInt(900) + 100
        (Some(col("__src_cents") > th), s => s > th)
      case 2 => (Some(col("__src_cents") % 3 === 0), s => s % 3 == 0)
    }

  private def model(target: Map[Long, Long], source: Map[Long, Long],
      acts: Seq[(Boolean, Option[Cond])],
      ins: Option[Long => Boolean]): Map[Long, Long] = {
    val afterMatched = target.flatMap { case (k, t) =>
      source.get(k) match {
        case None => Some(k -> t)
        case Some(s) =>
          acts.find { case (_, c) => c.forall(f => f(t, s)) } match {
            case None => Some(k -> t) // no clause applied
            case Some((isDelete, _)) =>
              if (isDelete) None else Some(k -> s)
          }
      }
    }
    val inserts = ins.fold(Map.empty[Long, Long])(p =>
      source.filter { case (k, s) => !target.contains(k) && p(s) })
    afterMatched ++ inserts
  }

  test("random clause programs: engine snapshot == reference semantics, " +
      "every round") {
    val rnd = new scala.util.Random(4242)
    (1 to 12).foreach { round =>
      val p = Files.createTempDirectory(s"graft-mprop$round")
        .resolve("t").toString
      val target = (0 until 25).map(_ => rnd.nextInt(40).toLong)
        .distinct.map(k => k -> (rnd.nextInt(900) + 100).toLong).toMap
      Upsert.append(spark, p,
        target.toSeq.toDF("k", "cents"), None)
      val source = (0 until 15).map(_ => rnd.nextInt(60).toLong)
        .distinct.map(k => k -> (rnd.nextInt(900) + 100).toLong).toMap
      // 0..3 matched clauses (mix of update/delete), optional insert
      val nActs = rnd.nextInt(4)
      val acts = Seq.fill(nActs) {
        val (c, m) = conds(rnd)
        (rnd.nextBoolean(), c, m) // isDelete, Column cond, model cond
      }
      val withInsert = rnd.nextBoolean() || nActs == 0
      val (insCol, insModel) =
        if (withInsert) { val (c, m) = insConds(rnd); (Some(c), Some(m)) }
        else (None, None)
      val engineActs: Seq[Upsert.MatchedAction] = acts.map {
        case (true, c, _) => Upsert.MatchedDelete(c)
        case (false, c, _) => Upsert.MatchedUpdate(c)
      }
      Upsert.mergeActions(spark, p, source.toSeq.toDF("k", "cents"),
        Seq("k"), engineActs, insCol, Seq.empty)
      val got = Manifest.read(spark, p).as[(Long, Long)].collect().toMap
      val want = model(target, source,
        acts.map { case (d, _, m) => (d, m) }, insModel)
      assert(got === want,
        s"round $round diverged: acts=${acts.map(a => (a._1, a._2))} " +
          s"insert=$insCol\n got=$got\nwant=$want")
    }
  }

  // ---- round 15: the same property over COLUMN-LEVEL assignments ----

  /** Update-value grammar over a (k, cents, n) row: each variant is a
    * (engine assignment list, model transition). Empty list = SET *.
    */
  private def setVariants(rnd: scala.util.Random)
      : (Seq[(String, Column)], ((Long, Long), (Long, Long)) => (Long, Long)) =
    rnd.nextInt(4) match {
      case 0 => (Seq.empty, (_, s) => s) // SET * — full source row
      case 1 => (Seq("cents" -> (col("cents") + col("__src_cents"))),
        (t, s) => (t._1 + s._1, t._2))
      case 2 => (Seq("n" -> (col("n") + lit(1L))),
        (t, _) => (t._1, t._2 + 1))
      case 3 => (Seq("cents" -> col("__src_cents"),
        "n" -> (col("n") + col("__src_n"))),
        (t, s) => (s._1, t._2 + s._2))
    }

  test("random column-assignment programs: engine snapshot == reference " +
      "semantics, every round") {
    val rnd = new scala.util.Random(1515)
    (1 to 12).foreach { round =>
      val p = Files.createTempDirectory(s"graft-maprop$round")
        .resolve("t").toString
      val target = (0 until 25).map(_ => rnd.nextInt(40).toLong).distinct
        .map(k => k -> ((rnd.nextInt(900) + 100).toLong,
          rnd.nextInt(10).toLong)).toMap
      Upsert.append(spark, p,
        target.toSeq.map { case (k, (c, n)) => (k, c, n) }
          .toDF("k", "cents", "n"), None)
      val source = (0 until 15).map(_ => rnd.nextInt(60).toLong).distinct
        .map(k => k -> ((rnd.nextInt(900) + 100).toLong,
          rnd.nextInt(10).toLong)).toMap
      val nActs = rnd.nextInt(3) + 1
      val acts = Seq.fill(nActs) {
        val (c, m) = conds(rnd)
        if (rnd.nextInt(4) == 0) (None, c, m) // delete
        else { val (set, f) = setVariants(rnd); (Some((set, f)), c, m) }
      }
      val withInsert = rnd.nextBoolean()
      val (insCol, insModel) =
        if (withInsert) { val (c, m) = insConds(rnd); (Some(c), Some(m)) }
        else (None, None)
      val engineActs: Seq[Upsert.MatchedAction] = acts.map {
        case (None, c, _) => Upsert.MatchedDelete(c)
        case (Some((set, _)), c, _) => Upsert.MatchedUpdate(c, set)
      }
      Upsert.mergeActions(spark, p,
        source.toSeq.map { case (k, (c, n)) => (k, c, n) }
          .toDF("k", "cents", "n"),
        Seq("k"), engineActs, insCol, Seq.empty)
      val got = Manifest.read(spark, p).as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // model: first clause whose cents-condition holds applies its
      // transition (None = delete); unmatched source rows insert fully
      val afterMatched = target.flatMap { case (k, t) =>
        source.get(k) match {
          case None => Some(k -> t)
          case Some(s) =>
            acts.find { case (_, _, c) => c.forall(f => f(t._1, s._1)) }
              match {
                case None => Some(k -> t)
                case Some((None, _, _)) => None // delete
                case Some((Some((_, f)), _, _)) => Some(k -> f(t, s))
              }
        }
      }
      val inserts = insModel.fold(Map.empty[Long, (Long, Long)])(pr =>
        source.filter { case (k, s) => !target.contains(k) && pr(s._1) })
      val want = afterMatched ++ inserts
      assert(got === want,
        s"round $round diverged:\n got=$got\nwant=$want")
    }
  }

  // ---- round 15: the FULL program — by-source clauses + column-level
  // insert, same differential discipline ----

  /** By-source clause grammar: conditions and values see TARGET columns
    * only. Each variant = (engine action, model transition where None =
    * delete); model rows are (cents, n-as-Option for NULL-fill inserts).
    */
  private def bySourceVariants(rnd: scala.util.Random)
      : (Upsert.BySourceAction,
         Option[((Long, Option[Long])) => (Long, Option[Long])], Long => Boolean) = {
    val (cond, pred): (Option[Column], Long => Boolean) =
      rnd.nextInt(3) match {
        case 0 => (None, _ => true)
        case 1 =>
          val th = rnd.nextInt(900) + 100
          (Some(col("cents") >= th), t => t >= th)
        case 2 => (Some(col("cents") % 2 === 0), t => t % 2 == 0)
      }
    rnd.nextInt(3) match {
      case 0 => (Upsert.BySourceDelete(cond), None, pred)
      case 1 => (Upsert.BySourceUpdate(cond,
        Seq("cents" -> (col("cents") * 2))),
        Some(r => (r._1 * 2, r._2)), pred)
      case 2 => (Upsert.BySourceUpdate(cond,
        Seq("n" -> lit(null).cast("bigint"))),
        Some(r => (r._1, None)), pred)
    }
  }

  test("random FULL merge programs (matched + by-source + column-level " +
      "insert): engine snapshot == reference semantics") {
    val rnd = new scala.util.Random(5151)
    (1 to 12).foreach { round =>
      val p = Files.createTempDirectory(s"graft-mfull$round")
        .resolve("t").toString
      val target = (0 until 25).map(_ => rnd.nextInt(40).toLong).distinct
        .map(k => k -> ((rnd.nextInt(900) + 100).toLong,
          rnd.nextInt(10).toLong)).toMap
      Upsert.append(spark, p,
        target.toSeq.map { case (k, (c, n)) => (k, c, n) }
          .toDF("k", "cents", "n"), None)
      val source = (0 until 15).map(_ => rnd.nextInt(60).toLong).distinct
        .map(k => k -> ((rnd.nextInt(900) + 100).toLong,
          rnd.nextInt(10).toLong)).toMap
      // 0..2 matched clauses over the shared grammar
      val mActs = Seq.fill(rnd.nextInt(3)) {
        val (c, m) = conds(rnd)
        (rnd.nextBoolean(), c, m)
      }
      val engineMatched: Seq[Upsert.MatchedAction] = mActs.map {
        case (true, c, _) => Upsert.MatchedDelete(c)
        case (false, c, _) => Upsert.MatchedUpdate(c)
      }
      // 0..2 by-source clauses
      val bsActs = Seq.fill(rnd.nextInt(3))(bySourceVariants(rnd))
      // insert: absent, star, or column-level (n unassigned → NULL)
      val insMode = rnd.nextInt(3)
      val insSpec = insMode match {
        case 0 => None
        case 1 => Some(Upsert.InsertSpec(None))
        case 2 => Some(Upsert.InsertSpec(None,
          Some(Seq("cents" -> (col("__src_cents") * 3)))))
      }
      Upsert.mergeProgram(spark, p,
        source.toSeq.map { case (k, (c, n)) => (k, c, n) }
          .toDF("k", "cents", "n"),
        Seq("k"), engineMatched, bsActs.map(_._1), insSpec, Seq.empty)
      val got = Manifest.read(spark, p)
        .as[(Long, Long, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val afterTarget = target.flatMap { case (k, t) =>
        source.get(k) match {
          case Some(s) => // matched family
            mActs.find { case (_, _, c) => c.forall(f => f(t._1, s._1)) }
              match {
                case None => Some(k -> ((t._1, Option(t._2))))
                case Some((true, _, _)) => None
                case Some((false, _, _)) => Some(k -> ((s._1, Option(s._2))))
              }
          case None => // by-source family
            bsActs.find { case (_, _, pred) => pred(t._1) } match {
              case None => Some(k -> ((t._1, Option(t._2))))
              case Some((_, None, _)) => None // delete
              case Some((_, Some(f), _)) =>
                Some(k -> f((t._1, Option(t._2))))
            }
        }
      }
      val inserts: Map[Long, (Long, Option[Long])] = insMode match {
        case 0 => Map.empty
        case 1 => source.collect {
          case (k, s) if !target.contains(k) => k -> ((s._1, Option(s._2))) }
        case 2 => source.collect {
          case (k, s) if !target.contains(k) =>
            k -> ((s._1 * 3, Option.empty[Long])) }
      }
      val want = afterTarget ++ inserts
      assert(got === want,
        s"round $round diverged (ins=$insMode):\n got=$got\nwant=$want")
    }
  }
}
