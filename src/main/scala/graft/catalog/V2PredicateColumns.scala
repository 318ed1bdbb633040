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
