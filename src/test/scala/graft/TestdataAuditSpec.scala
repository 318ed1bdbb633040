package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Round-start testdata contract check ([[Tables.auditSchemas]]): every
  * driver-generated table must read — post `Tables.t` normalization —
  * at the canonical dtypes the 168-query registry and its DuckDB oracle
  * were validated against. A regeneration that drifts (round 7: the
  * events.ts parquet unit flipped NANOS→MICROS mid-round) fails HERE
  * with one named line per drift instead of as a wall of confusing
  * query mismatches.
  */
class TestdataAuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("driver testdata matches the canonical schema contract") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val drifts = Tables.auditSchemas(spark, sfDir)
    assert(drifts.isEmpty,
      "testdata schema drift:\n  " + drifts.mkString("\n  "))
  }

  test("audit names a dtype drift descriptively") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-audit-drift").toString
    // a documents table whose doc_id drifted bigint→string
    spark.range(3).select(
        col("id").cast("string").as("doc_id"), lit("t").as("text"),
        lit("en").as("lang"), lit("s").as("source"),
        lit(1L).as("n_chars"))
      .write.parquet(s"$dir/documents.parquet")
    val drifts = Tables.auditSchemas(spark, dir)
    assert(drifts.exists(d => d.contains("documents.doc_id") &&
      d.contains("expected one of bigint") && d.contains("got string")),
      drifts.mkString("\n"))
    // every other table is reported unreadable (missing), not silent
    assert(drifts.exists(_.startsWith("lineitem: unreadable")))
  }
}
