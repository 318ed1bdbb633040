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

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects (no nanosecond TimestampType). Reading it as a plain
    * INT64 via an explicit schema works in any session (no legacy flag
    * needed); we then truncate ns→µs in exact integer math, which is also
    * what DuckDB-on-ns effectively compares at for date/bucket outputs.
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      raw(spark, sfDir, name)
        .withColumn("ts",
          timestamp_micros(call_function("div", col("ts"), lit(1000L))))
    } else raw(spark, sfDir, name)

  /** The table WITHOUT the events ts conversion (`ts` stays the raw
    * int64) — for tooling that copies/rewrites table files
    * ([[graft.tools.Soak]]): a rewritten events file keeps an integer
    * `ts` column, which [[t]]'s explicit LongType schema reads from
    * either the original NANOS file or a rewritten BIGINT one.
    */
  private[graft] def raw(spark: SparkSession, sfDir: String,
      name: String): DataFrame =
    if (name == "events")
      spark.read.schema(eventsSchema).parquet(s"$sfDir/events.parquet")
    else spark.read.parquet(s"$sfDir/$name.parquet")
}
