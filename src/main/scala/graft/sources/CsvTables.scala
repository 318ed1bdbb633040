package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV source/sink in the reference's intermediate format — `;` delimiter
  * with a header row (`transformed_from_s3_to_pg.py:52-68,81-92`; S5/S6).
  * SURVEY argues the CSV hop itself is an artifact of the Python↔Postgres
  * boundary and should be eliminated from the main path (it is — ingest
  * goes JSON→DataFrame directly); these functions exist so a user of the
  * reference can still round-trip the same files.
  */
object CsvTables {

  /** `ods.daily_data` CSV schema, column order per the reference's header
    * row (`transformed_from_s3_to_pg.py:58`).
    */
  val odsCsvSchema: StructType = StructType(Seq(
    StructField("song_name", StringType),
    StructField("artist_name", StringType),
    StructField("duration_sec", IntegerType),
    StructField("listeners_count", IntegerType),
    StructField("song_rank", IntegerType),
    StructField("source_date", DateType),
    StructField("country", StringType)))

  def writeOdsCsv(df: DataFrame, path: String): Unit =
    df.select(odsCsvSchema.fieldNames.toIndexedSeq.map(df.col): _*)
      .write.mode("overwrite")
      .option("header", value = true).option("delimiter", ";")
      .csv(path)

  /** Explicit schema (never inferSchema — a second pass over the data and
    * a type lottery at scale).
    */
  def readOdsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(odsCsvSchema)
      .option("header", value = true).option("delimiter", ";")
      .csv(path)
}
