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

  /** Re-base a micro-batch DataFrame onto its already-computed RDD
    * (round 17, the named streaming sink): a V1 `Sink.addBatch` frame is
    * backed by the trigger's IncrementalExecution and must not be
    * re-planned by a verb that takes more than one action on it.
    * `internalCreateDataFrame` is `private[sql]` — same bridge rationale
    * as [[ofRows]].
    */
  def freshBatchDf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Batch plan → STREAMING DataFrame (round 18, the named streaming
    * source): a V1 `Source.getBatch` result must satisfy
    * MicroBatchExecution's `isStreaming` assertion, and the only door
    * is the same `private[sql]` `internalCreateDataFrame` with the
    * flag set. The RDD is the batch plan's lazily-planned execution —
    * nothing runs until the trigger does.
    */
  def streamingBatchDf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  // ---- catalog-manager bridge (round 17, persistent views) ----------
  // CatalogManager is private[sql]; the view SQL surface needs name →
  // (catalog, identifier) resolution with Spark's own precedence
  // (registered catalog head wins, else current catalog + namespace).

  private def cm(spark: org.apache.spark.sql.SparkSession) =
    spark.sessionState.catalogManager

  def isCatalogRegistered(spark: org.apache.spark.sql.SparkSession,
      name: String): Boolean = cm(spark).isCatalogRegistered(name)

  /** Named catalog, or the session's current one. */
  def catalogPlugin(spark: org.apache.spark.sql.SparkSession,
      name: Option[String])
      : org.apache.spark.sql.connector.catalog.CatalogPlugin =
    name.fold(cm(spark).currentCatalog)(cm(spark).catalog)

  def currentCatalogName(
      spark: org.apache.spark.sql.SparkSession): String =
    cm(spark).currentCatalog.name()

  def currentNamespace(
      spark: org.apache.spark.sql.SparkSession): Array[String] =
    cm(spark).currentNamespace

  /** Resolve multipart name parts the way the analyzer's LookupCatalog
    * does: a registered-catalog head claims the name; otherwise the
    * current catalog (current namespace for 1-part names).
    */
  def catalogAndIdentifier(spark: org.apache.spark.sql.SparkSession,
      parts: Seq[String])
      : (org.apache.spark.sql.connector.catalog.CatalogPlugin,
        org.apache.spark.sql.connector.catalog.Identifier) = {
    val m = cm(spark)
    import org.apache.spark.sql.connector.catalog.Identifier
    if (parts.size > 1 && m.isCatalogRegistered(parts.head))
      (m.catalog(parts.head),
        Identifier.of(parts.tail.dropRight(1).toArray, parts.last))
    else if (parts.size > 1)
      (m.currentCatalog,
        Identifier.of(parts.dropRight(1).toArray, parts.last))
    else
      (m.currentCatalog, Identifier.of(m.currentNamespace, parts.last))
  }
}
