package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CsvTables

/** The reference's `;`-CSV hop as a typed unit: write → read preserves
  * rows, types, and column order (the oracle-level check lives in
  * q_csv_roundtrip; this is the fast in-memory contract).
  */
class CsvTablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ODS rows survive the ;-CSV round trip typed and ordered") {
    val ods = graft.ingest.OdsBuilder.ingest(spark)
    val path = Files.createTempDirectory("graft-csv").resolve("ods").toString
    CsvTables.writeOdsCsv(ods, path)
    val back = CsvTables.readOdsCsv(spark, path)
    assert(back.schema === CsvTables.odsCsvSchema)
    val key = Seq("song_rank", "source_date", "country")
    assert(back.count() === ods.count())
    // value-level equality on the full projection
    val a = ods.select(CsvTables.odsCsvSchema.fieldNames.toIndexedSeq.map(ods.col): _*)
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    val b = back.collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(a === b)
    assert(back.groupBy(key.map(back.col): _*).count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() === 0)
  }

  test("ODS rows survive the JSONL hop losslessly (q_jsonl_roundtrip contract)") {
    val ods = graft.ingest.OdsBuilder.ingest(spark)
    val back = graft.queries.MiscQueries.qJsonlRoundtrip.run(spark, "")
    assert(back.schema === CsvTables.odsCsvSchema)
    val a = ods.select(CsvTables.odsCsvSchema.fieldNames.toIndexedSeq.map(ods.col): _*)
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    val b = back.collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(a === b)
  }
}
