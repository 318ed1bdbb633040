package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global rank / running total / NTILE — the two-phase
  * range-partitioned replacement for `Window.orderBy(...)` with no
  * partition spec, which funnels the WHOLE relation through one task
  * (Spark logs `WindowExec: No Partition Defined` and ships a
  * single-partition sort — the canonical 100 TB scale-killer).
  *
  * Phase 1: a fully distributed range-partitioned sort (plain
  * `orderBy`, every task sorts its slice), then one job that collects
  * per-partition row counts and value sums — numPartitions pairs on
  * the driver, the same footprint `RDD.zipWithIndex` accepts. Phase 2:
  * a per-partition scan that adds each partition's offsets. The global
  * index is exact whatever boundaries the range sampler picked, so
  * results are deterministic as long as the order keys form a total
  * order (callers supply the tie-break), and phase 2 rereads phase 1's
  * shuffle files rather than recomputing the sort.
  *
  * The grand totals (row count, value sum) fall out of phase 1 for
  * free and are attached as literal columns on request — callers that
  * used to `crossJoin(broadcast(df.agg(sum(...))))` get the total
  * without a second evaluation of the input subplan.
  *
  * Running sums use `Math.addExact`: a silent 64-bit wrap would
  * corrupt every downstream class boundary, so overflow is loud
  * (ANSI discipline); callers whose running total can genuinely
  * exceed 2⁶³ must pre-scale the value column.
  *
  * This generalizes `StarBuilder.withSurrogateId` (the dim surrogate-id
  * assigner, the original instance of the pattern — see its scaladoc
  * for the reference lineage `ddl_dds.sql:3,9,15`).
  */
object DistributedRank {

  /** What to attach to each row, all computed in one sorted pass.
    *
    * @param rankCol  1-based global row number in sort order
    * @param valueCol existing non-null LongType column to accumulate
    * @param cumCol   inclusive running total of `valueCol`
    * @param ntileK   bucket count for `ntileCol`
    * @param ntileCol SQL NTILE(k) bucket (first n%k buckets one larger)
    * @param countCol literal total row count (free from phase 1)
    * @param totalCol literal grand total of `valueCol` (free from phase 1)
    * @param precMinCol EXCLUSIVE running minimum of `valueCol` — the
    *   distributed `MIN(v) OVER (ORDER BY … ROWS BETWEEN UNBOUNDED
    *   PRECEDING AND 1 PRECEDING)`; NULL on the global first row.
    *   Exclusive on purpose: the consumer (skyline / Pareto-frontier
    *   dominance, staircase tests) compares each row against strictly
    *   preceding rows, and deriving exclusive from inclusive would
    *   need a second global window (lag) — emitting the running state
    *   BEFORE folding in the current row costs nothing here.
    */
  final case class Spec(
      rankCol: Option[String] = None,
      valueCol: Option[String] = None,
      cumCol: Option[String] = None,
      ntileK: Option[Int] = None,
      ntileCol: Option[String] = None,
      countCol: Option[String] = None,
      totalCol: Option[String] = None,
      precMinCol: Option[String] = None)

  /** Global 1-based row number in `order` — distributed `row_number()
    * OVER (ORDER BY ...)`.
    */
  def rank(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    apply(df, order, Spec(rankCol = Some(out)))

  /** Inclusive running total of `valueCol` in `order` — distributed
    * `SUM(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`.
    */
  def cumsum(df: DataFrame, order: Seq[Column], valueCol: String,
      out: String): DataFrame =
    apply(df, order, Spec(valueCol = Some(valueCol), cumCol = Some(out)))

  /** Distributed `NTILE(k) OVER (ORDER BY ...)` — equal-count buckets,
    * the first n%k buckets one row larger (SQL-standard semantics,
    * matching Spark's and DuckDB's `ntile`).
    */
  def ntile(df: DataFrame, order: Seq[Column], k: Int,
      out: String): DataFrame =
    apply(df, order, Spec(ntileK = Some(k), ntileCol = Some(out)))

  /** EXCLUSIVE running minimum of `valueCol` in `order` — distributed
    * `MIN(v) OVER (ORDER BY … ROWS BETWEEN UNBOUNDED PRECEDING AND
    * 1 PRECEDING)`, NULL on the global first row (see Spec.precMinCol
    * for why exclusive is the native form here).
    */
  def precmin(df: DataFrame, order: Seq[Column], valueCol: String,
      out: String): DataFrame =
    apply(df, order, Spec(valueCol = Some(valueCol), precMinCol = Some(out)))

  def apply(df: DataFrame, order: Seq[Column], spec: Spec): DataFrame = {
    require(spec.cumCol.isEmpty || spec.valueCol.isDefined,
      "cumCol needs valueCol")
    require(spec.totalCol.isEmpty || spec.valueCol.isDefined,
      "totalCol needs valueCol")
    require(spec.precMinCol.isEmpty || spec.valueCol.isDefined,
      "precMinCol needs valueCol")
    require(spec.ntileCol.isEmpty == spec.ntileK.isEmpty,
      "ntileCol and ntileK come together")
    val sorted = df.orderBy(order: _*)
    val vIdx = spec.valueCol.map(sorted.schema.fieldIndex)
    // A precmin-only caller never reads the running sum, so don't
    // accumulate it: Math.addExact on large bigint values could throw a
    // spurious overflow for a computation the caller never asked for
    // (the min is well-defined regardless of the sum).
    val needSum = spec.cumCol.isDefined || spec.totalCol.isDefined
    val rdd = sorted.rdd // ONE rdd: phase 2 reuses phase 1's shuffle
    val stats = rdd.mapPartitionsWithIndex { (i, it) =>
      var n = 0L; var s = 0L; var mn = Long.MaxValue
      vIdx match {
        case Some(j) => it.foreach { r =>
          n += 1L; val v = r.getLong(j)
          if (needSum) s = Math.addExact(s, v)
          mn = Math.min(mn, v) }
        case None => it.foreach { _ => n += 1L }
      }
      Iterator((i, n, s, mn))
    }.collect().sortBy(_._1)
    val rowOff = stats.scanLeft(0L)((a, t) => a + t._2)
    val sumOff = stats.scanLeft(0L)((a, t) => Math.addExact(a, t._3))
    // minOff(i) = min of valueCol over all partitions BEFORE i
    // (MaxValue = "nothing precedes" — emitted as NULL by phase 2)
    val minOff = stats.scanLeft(Long.MaxValue)((a, t) => Math.min(a, t._4))
    val nTotal = rowOff.last
    val vTotal = sumOff.last
    // NTILE geometry: with n rows and k buckets, buckets 1..n%k hold
    // ceil(n/k) rows, the rest floor(n/k); `cut` = last rank of the
    // large buckets. When n < k, q = 0 and every rank is <= cut, so
    // the q-division branch is never taken.
    val k = spec.ntileK.getOrElse(1).toLong
    val q = nTotal / k
    val rem = nTotal % k
    val cut = rem * (q + 1)
    val addRank = spec.rankCol.isDefined
    val addCum = spec.cumCol.isDefined
    val addNtile = spec.ntileCol.isDefined
    val addPrecMin = spec.precMinCol.isDefined
    val extra =
      spec.rankCol.map(StructField(_, LongType, nullable = false)).toSeq ++
        spec.cumCol.map(StructField(_, LongType, nullable = false)) ++
        spec.ntileCol.map(StructField(_, LongType, nullable = false)) ++
        spec.precMinCol.map(StructField(_, LongType, nullable = true))
    val outSchema = StructType(sorted.schema.fields ++ extra)
    val annotated = rdd.mapPartitionsWithIndex { (i, it) =>
      var rk = rowOff(i)
      var cum = sumOff(i)
      var rmin = minOff(i)
      it.map { r =>
        rk += 1L
        // prec-min is emitted BEFORE this row's value folds in
        // (exclusive semantics), so capture the state first
        val prec: Any = if (rmin == Long.MaxValue) null else rmin
        vIdx.foreach { j =>
          val v = r.getLong(j)
          if (needSum) cum = Math.addExact(cum, v)
          rmin = Math.min(rmin, v)
        }
        var extras: List[Any] = Nil
        if (addPrecMin) extras ::= prec
        if (addNtile) extras ::=
          (if (rk <= cut) (rk - 1) / (q + 1) + 1
           else rem + (rk - 1 - cut) / q + 1)
        if (addCum) extras ::= cum
        if (addRank) extras ::= rk
        Row.fromSeq(r.toSeq ++ extras)
      }
    }
    val out = sorted.sparkSession.createDataFrame(annotated, outSchema)
    val withCount = spec.countCol.fold(out)(c => out.withColumn(c, lit(nTotal)))
    spec.totalCol.fold(withCount)(c => withCount.withColumn(c, lit(vTotal)))
  }
}
