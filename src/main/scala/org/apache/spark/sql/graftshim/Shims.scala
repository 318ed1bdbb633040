package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 marks `ExpressionUtils`
  * `private[sql]`, so third-party native expressions reach it from a
  * subpackage — the standard extension-library technique (same pattern
  * as public Spark connector/extension projects; no Spark internals are
  * modified or copied).
  */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Proper wrong-number-of-arguments AnalysisException for registered
    * SQL functions (the error builders are `private[sql]`).
    */
  def wrongNumArgs(name: String, expected: Int, actual: Int): Throwable =
    org.apache.spark.sql.errors.QueryCompilationErrors
      .wrongNumArgsError(name, Seq(expected), actual)

  /** LogicalPlan → DataFrame for analysis-time TVF expansion
    * (`Dataset.ofRows` is `private[sql]` in Spark 4's classic module).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
