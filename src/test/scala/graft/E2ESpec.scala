package graft

import java.sql.Date
import org.scalatest.funsuite.AnyFunSuite

/** Full-vertical golden test: raw fixture JSON → ODS → star → royalties
  * mart, compared against values independently verified by the DuckDB
  * oracle (read_json over the same files).
  */
class E2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("raw JSON to royalties mart reproduces oracle-verified golden rows") {
    val out = graft.queries.IngestQueries.e2eRoyaltiesQuery.run(spark, "")
      .as[(Date, String, Double)].collect()
    assert(out.length === 10) // 5 artists × 2 dates
    val m = out.map { case (d, a, r) => (d.toString, a) -> r }.toMap
    assert(m(("2024-05-01", "Artist 0")) === 24323.4)
    assert(m(("2024-05-01", "Artist 1")) === 19905.3)
    assert(m(("2024-05-02", "Artist 0")) === 27236.91)
  }

  test("flagship entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a registered query (driver contract)") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(qs.size === SparkEntry.registry.size, "duplicate query names")
  }
}
