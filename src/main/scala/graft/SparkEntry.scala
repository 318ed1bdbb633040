package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Registry of every implemented operator (SURVEY.md §2 + extension
  * surface), each paired with an ANSI-SQL DuckDB oracle where the
  * semantics are SQL-expressible.
  */
object SparkEntry {

  /** Full registry, assembled from the per-area modules. */
  def registry: Seq[QueryDef] =
    Relational.all ++ ChartQueries.all ++ IngestQueries.all ++
      DocQueries.all ++ VectorQueries.all ++ StreamQueries.all ++
      MiscQueries.all ++ ExtQueries.all ++ JoinQueries.all ++
      ScaleQueries.all ++ AnalyticQueries.all ++ EventQueries.all ++
      WarehouseQueries.all ++ CurationQueries.all ++ RelationalMore.all ++
      TpchFull.all ++ TrainingQueries.all ++ SearchQueries.all ++
      SqlSurfaceQueries.all ++ GraphQueries.all ++ FrontierQueries.all ++
      BpeQueries.all ++ CatalogQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The raw-JSON end-to-end royalties mart exercises the whole reference
    * vertical: multiLine JSON read → flatten → cast → filename recovery →
    * dedup → imputation → star join → mart aggregate (SURVEY §7.3).
    */
  def entry(spark: SparkSession): DataFrame =
    IngestQueries.e2eRoyaltiesQuery.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap

  /** Headline subset for the per-round Bench (excludes quadratic
    * pair-generation ops that are only meant for sf≤0.01 verification).
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    registry.filter(_.bench).map(q => q.name -> q.run).toMap
}
