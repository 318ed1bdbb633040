package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped value-at-rank (discrete quantiles) over an integer
  * column, computed WITHOUT ever shuffling or sorting anything
  * fact-sized — the two-phase histogram-refinement algorithm:
  *
  *  1. The fact collapses to a per-(group, bucket) count histogram,
  *     where `bucket = value >> log2(bucketWidth)` (arithmetic shift =
  *     floor division, correct for negatives). A cumulative count over
  *     the tiny histogram locates, for each requested rank, the single
  *     BOUNDARY bucket that contains it and the rank offset before it.
  *  2. A second pass keeps only rows in boundary buckets (a broadcast
  *     semi-join against the |groups|×|quantiles|-row boundary set) and
  *     histograms them per VALUE. A bucket spans at most `bucketWidth`
  *     distinct integers, so this refine histogram is bounded by
  *     |groups|·|quantiles|·bucketWidth ROWS REGARDLESS OF SKEW — a
  *     billion repeats of one value land in one histogram row, not one
  *     task. The value at the local rank falls out of a cumulative
  *     count over that bounded histogram.
  *
  * Compare: rank-over-DISTINCT-values windows (the q_winsorize round-5
  * form) shuffle |distinct values| rows — for near-continuous measures
  * (prices, latencies) that is within a constant of the fact itself.
  * Here both shuffles are histogram-sized and the fact is only ever
  * scanned (pruned to group+value columns) and filtered.
  *
  * Ranks are 1-based and DISCRETE (the exact element at the position,
  * never interpolated): `rank = ceil(n · num / den)` per group, in
  * pure integer math — hash-stable across engines, no doubles anywhere.
  * Overflow (QueryDef checklist): `n · num` pairs the data-scaled n
  * with the BOUNDED quantile numerator (num ≤ den, typically ≤ 1000),
  * so headroom holds to n < 2⁶³/den — far past any row count.
  */
object GroupedQuantiles {

  /** One requested order statistic: `out` column = the group's value at
    * 1-based rank `ceil(n·num/den)` (n = group row count).
    */
  final case class Q(out: String, num: Long, den: Long) {
    require(num >= 1 && den >= 1 && num <= den,
      s"quantile $out: need 1 <= num <= den, got $num/$den")
  }

  /** One row per group: `groupCols ++ qs.map(_.out)`, where each output
    * column holds the exact value at that quantile's rank.
    *
    * @param bucketWidth power-of-two coarse-bucket width; the refine
    *   pass is bounded by |groups|·|qs|·bucketWidth histogram rows
    */
  def valueAtRanks(df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[Q], bucketWidth: Long = 1L << 16): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.map(_.out).distinct.size == qs.size, "duplicate out names")
    require(bucketWidth >= 2 && (bucketWidth & (bucketWidth - 1)) == 0,
      s"bucketWidth must be a power of two >= 2, got $bucketWidth")
    val shift = java.lang.Long.numberOfTrailingZeros(bucketWidth)
    val g = groupCols.map(col)
    val v = col(valueCol)
    val byGroup = Window.partitionBy(g: _*)

    // Phase 1: coarse histogram + per-quantile boundary bucket.
    val hist = df.select(g :+ shiftright(v, shift).as("__bucket"): _*)
      .groupBy((g :+ col("__bucket")): _*).agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(byGroup.orderBy(col("__bucket"))))
      .withColumn("__n", sum(col("__cnt")).over(byGroup))
    // rank = ceil(n*num/den) in integer math; the boundary bucket is the
    // SMALLEST bucket whose cumulative count reaches it. min over a
    // (bucket, before) struct picks that bucket and carries the count
    // mass before it in the same aggregate.
    def rank(q: Q): Column =
      call_function("div", col("__n") * q.num + (q.den - 1), lit(q.den))
    val boundaryCols = qs.map { q =>
      min(when(col("__cum") >= rank(q),
        struct(col("__bucket"), (col("__cum") - col("__cnt")).as("__before"),
          rank(q).as("__rank")))).as(q.out)
    }
    val perGroup = hist.groupBy(g: _*).agg(boundaryCols.head, boundaryCols.tail: _*)
    // One row per (group, quantile): boundary bucket + rank within it.
    val boundaries = perGroup.select(
      g :+ explode(array(qs.map { q =>
        struct(lit(q.out).as("__q"), col(q.out).getField("__bucket").as("__bucket"),
          (col(q.out).getField("__rank") - col(q.out).getField("__before"))
            .as("__local"))
      }: _*)).as("__b"): _*)
      .select(g ++ Seq(col("__b.__q"), col("__b.__bucket"), col("__b.__local")): _*)

    // Phase 2: refine inside boundary buckets only. The per-value
    // histogram is bounded by bucketWidth distinct values per boundary,
    // immune to value skew.
    val byBoundary = Window.partitionBy((g :+ col("__q")): _*)
    val refined = df.select(g ++ Seq(v.as("__v"), shiftright(v, shift).as("__bucket")): _*)
      .join(broadcast(boundaries), groupCols :+ "__bucket")
      .groupBy((g ++ Seq(col("__q"), col("__local"), col("__v"))): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(byBoundary.orderBy(col("__v"))))
      .filter(col("__cum") - col("__cnt") < col("__local") &&
        col("__local") <= col("__cum"))
      .select(g ++ Seq(col("__q"), col("__v")): _*)

    refined.groupBy(g: _*).pivot("__q", qs.map(_.out)).agg(first(col("__v")))
  }
}
