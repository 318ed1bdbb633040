package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Test-table access for the driver harness (TESTDATA.md).
  *
  * Every `SparkEntry.queries` function receives `(spark, sfDir)` and reads
  * parquet from `sfDir`; the DuckDB oracle reads the same files under the
  * bare table name. Centralizing the read keeps scan options (vectorized
  * parquet reader, pushdown) uniform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) — which Spark's reader rejects (no
    * nanosecond TimestampType) — and plain TIMESTAMP(MICROS). The unit is
    * a property of the FILE, so [[t]] detects it from the footer-inferred
    * schema instead of assuming either: a timestamp-typed `ts` is read
    * natively (NTZ normalized to TimestampType — identical instants under
    * the UTC session zone every entrypoint pins), while a NANOS file
    * (inference throws) falls back to an explicit INT64 schema and exact
    * integer ns→µs truncation, which is also what DuckDB-on-ns
    * effectively compares at for date/bucket outputs.
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Footer-inferred `ts` type, or None when inference itself rejects the
    * file (the TIMESTAMP(NANOS) generation). Resolution is one footer
    * read on the driver — the same work the non-events branch already
    * does — so no extra job is scheduled.
    */
  private def eventsTsType(spark: SparkSession, path: String) =
    try spark.read.parquet(path).schema.find(_.name == "ts").map(_.dataType)
    catch { case scala.util.control.NonFatal(_) => None }

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      val path = s"$sfDir/events.parquet"
      eventsTsType(spark, path) match {
        case Some(TimestampType) => spark.read.parquet(path)
        case Some(TimestampNTZType) =>
          spark.read.parquet(path)
            .withColumn("ts", col("ts").cast(TimestampType))
        case _ =>
          raw(spark, sfDir, name)
            .withColumn("ts",
              timestamp_micros(call_function("div", col("ts"), lit(1000L))))
      }
    } else raw(spark, sfDir, name)

  /** The table in its file-native `ts` representation — for tooling that
    * copies/rewrites table files ([[graft.tools.Soak]]). A micros file is
    * copied as a timestamp column (so [[t]]'s detection keeps reading the
    * rewrite natively); a NANOS file is copied as the raw int64 (a
    * rewritten BIGINT column falls into [[t]]'s ns fallback, preserving
    * the legacy unit).
    */
  private[graft] def raw(spark: SparkSession, sfDir: String,
      name: String): DataFrame =
    if (name == "events") {
      val path = s"$sfDir/events.parquet"
      eventsTsType(spark, path) match {
        case Some(TimestampType) | Some(TimestampNTZType) =>
          spark.read.parquet(path)
        case _ => spark.read.schema(eventsSchema).parquet(path)
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
}
