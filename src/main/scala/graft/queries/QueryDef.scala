package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One driver-checkable query: a Spark implementation plus (where
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. See SURVEY.md §5 (test strategy) and the driver contract in
  * `graft.SparkEntry`.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the per-round Bench headline set */
    bench: Boolean = true)

object QueryDef {

  /** Exact-arithmetic column helpers.
    *
    * Hash-match discipline: every aggregated numeric output is computed in
    * exact integer/decimal arithmetic and only converted to DOUBLE (or kept
    * BIGINT) at the very end. Decimal→double conversion is correctly
    * rounded and therefore bit-identical between Spark and DuckDB, which
    * makes the driver's value-hash comparison deterministic. Raw column
    * pass-through (no arithmetic) is always safe.
    *
    * Overflow discipline (review gate for every new query — the round-6
    * Gini/lift/ABC lesson): any integer PRODUCT whose factors both scale
    * with the data (rank×value, count×count, cum×percent) goes
    * DECIMAL(38,0) on the Spark side and HUGEINT in the oracle FROM DAY
    * ONE — `SUM(CAST(i AS HUGEINT) * x)`, not `SUM(i * x)`, because the
    * per-row product overflows BIGINT before any wider accumulator sees
    * it. Running SUMS of data-scaled values use `Math.addExact` /
    * ANSI-mode addition so a wrap is loud, never silent. A product of
    * one data-scaled factor and one BOUNDED factor (×100 for percent,
    * ×weights ≤ 1e4) needs only the headroom of the bound — document
    * the bound at the call site.
    */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** round-half-up(p/q) for positive integer columns, in pure integer
    * math: floor((2p+q)/(2q)) — immune to engine-specific ROUND/AVG
    * float behavior. Mirrors PG `numeric::int` semantics (SURVEY §7.4.3).
    */
  def divRoundHalfUp(p: Column, q: Column): Column =
    call_function("div", p * 2 + q, q * 2)
}
