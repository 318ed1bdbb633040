package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.functions.{col, lit}

/** DSv2 [[V2Predicate]] → [[Column]] translation for the catalog's
  * `DELETE FROM … WHERE …` path: Spark hands [[graft.catalog.GraftTable
  * .deleteWhere]] connector predicates, the engine's
  * [[graft.engine.Upsert.deleteWhere]] wants a Column. Translation is
  * TOTAL-or-nothing per predicate: any shape this does not recognise
  * makes the whole conjunction `None`, and `canDeleteWhere` then
  * refuses the statement loudly (a partial translation would silently
  * delete the wrong rows). Literal values arrive in catalyst's internal
  * representation (UTF8String, epoch days/micros) and are converted
  * back to Scala values before `lit`.
  */
object V2PredicateColumns {

  /** The conjunction of `predicates`, or None if ANY of them is
    * untranslatable. An empty array is Spark's TRUNCATE TABLE —
    * the always-true delete.
    */
  def translateAll(predicates: Array[V2Predicate]): Option[Column] = {
    if (predicates.isEmpty) return Some(lit(true))
    val cs = predicates.map(translate)
    if (cs.contains(None)) None else Some(cs.flatten.reduce(_ && _))
  }

  def translate(p: V2Predicate): Option[Column] = {
    val kids = p.children()
    def bin(f: (Column, Column) => Column): Option[Column] =
      if (kids.length != 2) None
      else for { a <- operand(kids(0)); b <- operand(kids(1)) } yield f(a, b)
    def sub(i: Int): Option[Column] = kids(i) match {
      case q: V2Predicate => translate(q)
      case _ => None
    }
    p.name() match {
      case "ALWAYS_TRUE" => Some(lit(true))
      case "ALWAYS_FALSE" => Some(lit(false))
      case "=" => bin(_ === _)
      case "<=>" => bin(_ <=> _)
      case "<>" | "!=" => bin(_ =!= _)
      case ">" => bin(_ > _)
      case ">=" => bin(_ >= _)
      case "<" => bin(_ < _)
      case "<=" => bin(_ <= _)
      case "IS_NULL" if kids.length == 1 => operand(kids(0)).map(_.isNull)
      case "IS_NOT_NULL" if kids.length == 1 =>
        operand(kids(0)).map(_.isNotNull)
      case "STARTS_WITH" => bin(_ startsWith _)
      case "ENDS_WITH" => bin(_ endsWith _)
      case "CONTAINS" => bin(_ contains _)
      case "IN" if kids.nonEmpty =>
        val vs = kids.toSeq.tail.map(scalaLiteral)
        if (vs.contains(None)) None
        else operand(kids(0)).map(_.isin(vs.flatten: _*))
      case "AND" if kids.length == 2 =>
        for { a <- sub(0); b <- sub(1) } yield a && b
      case "OR" if kids.length == 2 =>
        for { a <- sub(0); b <- sub(1) } yield a || b
      case "NOT" if kids.length == 1 => sub(0).map(!_)
      case _ => None
    }
  }

  private def operand(e: V2Expression): Option[Column] = e match {
    case r: NamedReference => Some(col(r.fieldNames.mkString(".")))
    case l: V2Literal[_] => scalaLiteral(l).map(lit(_))
    case _ => None
  }

  private def scalaLiteral(e: V2Expression): Option[Any] = e match {
    case l: V2Literal[_] =>
      Some(CatalystTypeConverters.convertToScala(l.value, l.dataType))
    case _ => None
  }
}

/** `col = literal` extractor over a [[V2Predicate]], rendering the
  * literal as the PARTITION-DIRECTORY string Spark's writers use for
  * it (`d=2024-07-01`) — the static `INSERT OVERWRITE … PARTITION`
  * path matches it against staged directory names.
  */
private[catalog] object StaticPartitionEq {

  /** Accepted shapes: a bare `=`/`<=>`, an AND carrying the eq plus
    * IS_NOT_NULL guards, and the analyzer's full null-safe expansion
    * `(… AND c = lit) OR (c IS NULL AND lit IS NULL)` — the OR's
    * null-null arm is vacuous because the extracted literal is
    * provably non-null (a NULL literal never extracts).
    */
  def unapply(p: V2Predicate): Option[(String, String)] = {
    def preds(q: V2Predicate): Option[Seq[V2Predicate]] = {
      val ks = q.children().collect { case c: V2Predicate => c }.toSeq
      if (ks.length == q.children().length) Some(ks) else None
    }
    p.name() match {
      case "=" | "<=>" => binEq(p)
      case "AND" => preds(p).flatMap { ks =>
        val eqs = ks.flatMap(unapply(_))
        if (eqs.distinct.length == 1 &&
          ks.filter(unapply(_).isEmpty).forall(_.name() == "IS_NOT_NULL"))
          Some(eqs.head)
        else None
      }
      case "OR" => preds(p).flatMap {
        case Seq(a, b) =>
          unapply(a).filter(_ => isNullNullGuard(b))
            .orElse(unapply(b).filter(_ => isNullNullGuard(a)))
        case _ => None
      }
      case _ => None
    }
  }

  private def binEq(p: V2Predicate): Option[(String, String)] = {
    val kids = p.children()
    if (kids.length != 2) return None
    val pair = (kids(0), kids(1)) match {
      case (r: NamedReference, l: V2Literal[_]) => Some((r, l))
      case (l: V2Literal[_], r: NamedReference) => Some((r, l))
      case _ => None
    }
    pair.flatMap { case (r, l) =>
      if (r.fieldNames.length != 1) None
      else {
        // render EXACTLY as the partition writer does: a session-zone
        // catalyst Cast to string — java types' own toString differs
        // (java.sql.Timestamp appends '.0' and uses the JVM zone, so a
        // timestamp-partitioned static overwrite would never match its
        // staged directory; review fix, round 15)
        val rendered = org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.catalyst.expressions.Literal(
            l.value, l.dataType),
          org.apache.spark.sql.types.StringType,
          Some(org.apache.spark.sql.internal.SQLConf.get
            .sessionLocalTimeZone)).eval(null)
        Option(rendered).map(v => r.fieldNames.head -> v.toString)
      }
    }
  }

  /** `c IS NULL AND lit IS NULL` with a provably NON-NULL literal —
    * statically false, so the OR arm carrying it is vacuous. A guard
    * whose IS_NULLs are all over references is NOT vacuous and must
    * not match.
    */
  private def isNullNullGuard(p: V2Predicate): Boolean =
    p.name() == "AND" && p.children().forall {
      case q: V2Predicate => q.name() == "IS_NULL"
      case _ => false
    } && p.children().exists {
      case q: V2Predicate => q.children().headOption.exists {
        case l: V2Literal[_] => l.value != null
        case _ => false
      }
      case _ => false
    }
}
