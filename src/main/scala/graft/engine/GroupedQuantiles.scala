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
    require(qs.nonEmpty, "need at least one quantile")
    atRanks(df, groupCols, valueCol,
      qs.map(q => q.out -> ((n: Column) =>
        call_function("div", n * q.num + (q.den - 1), lit(q.den)))),
      bucketWidth)
      .drop("__gq_n")
  }

  /** Linearly INTERPOLATED quantiles — the `percentile`/`quantile_cont`
    * definition (`pos = p·(n−1)`, value = v⌊pos⌋ + frac·(v⌊pos⌋₊₁ −
    * v⌊pos⌋), both indices 0-based) — computed with the same
    * histogram-refinement passes instead of the built-in `percentile`
    * aggregate, whose buffer is a per-group value→count map held in ONE
    * reducer (executor-memory-bound for near-continuous measures).
    * The position/fraction arithmetic deliberately replicates the
    * engines' own double formula (p·(n−1), floor, v_lo + Δ·frac), so
    * results are bit-identical to Spark `percentile` AND DuckDB
    * `quantile_cont` on the same data. Output columns are DOUBLE.
    */
  def interpolated(df: DataFrame, groupCols: Seq[String], valueCol: String,
      probs: Seq[(String, Double)],
      bucketWidth: Long = 1L << 16): DataFrame = {
    require(probs.nonEmpty, "need at least one probability")
    require(probs.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      "probabilities must be in [0, 1]")
    // 1-based ranks of the two straddling order statistics; hi capped
    // at n so frac = 0 degenerates to the exact element.
    def pos(p: Double)(n: Column): Column = lit(p) * (n - 1).cast("double")
    val ranks = probs.flatMap { case (out, p) =>
      Seq(s"__lo_$out" -> ((n: Column) =>
        floor(pos(p)(n)).cast("long") + 1L),
        s"__hi_$out" -> ((n: Column) =>
          least(floor(pos(p)(n)).cast("long") + 2L, n)))
    }
    val at = atRanks(df, groupCols, valueCol, ranks, bucketWidth)
    val outCols = probs.map { case (out, p) =>
      val fr = pos(p)(col("__gq_n")) - floor(pos(p)(col("__gq_n")))
      (col(s"__lo_$out").cast("double") +
        (col(s"__hi_$out") - col(s"__lo_$out")).cast("double") * fr).as(out)
    }
    at.select(groupCols.map(col) ++ outCols: _*)
  }

  /** Fused winsorized sum (round 19): per group, the row count `n`,
    * the discrete rank bounds `lo`/`hi` (the [[Q]] rank definition of
    * [[valueAtRanks]]), and `wsum` = the EXACT sum of values clamped
    * into [lo, hi] — computed with the SAME two fact passes the bounds
    * alone already cost, instead of bounds-then-rescan-and-clamp (the
    * third fact pass q_winsorize paid before this existed). The
    * identity, with below = rows strictly < lo and above = rows
    * strictly > hi:
    *
    *   Σ clamp(v) = Σ v + (lo·|below| − Σ_below v)
    *                    + (hi·|above| − Σ_above v)
    *
    * Every term falls out of the existing passes once they carry value
    * sums alongside counts: phase 1's coarse histogram gains a
    * per-bucket Σv and its per-group cumulative (buckets before the
    * boundary bucket = the out-of-bucket below/above mass), and phase
    * 2's per-value refine histogram gains a cumulative value-weighted
    * sum (rows before/after the bound INSIDE its boundary bucket). All
    * arithmetic stays exact integer; the overflow exposure (LongType
    * sums of the value column) is identical to the unfused
    * `sum(clamp(v))` this replaces.
    */
  def winsorizedSum(df: DataFrame, groupCols: Seq[String], valueCol: String,
      loQ: Q, hiQ: Q, bucketWidth: Long = 1L << 16): DataFrame = {
    require(bucketWidth >= 2 && (bucketWidth & (bucketWidth - 1)) == 0,
      s"bucketWidth must be a power of two >= 2, got $bucketWidth")
    val shift = java.lang.Long.numberOfTrailingZeros(bucketWidth)
    val g = groupCols.map(col)
    val v = col(valueCol)
    val byGroup = Window.partitionBy(g: _*)
    val byBucket = byGroup.orderBy(col("__bucket"))

    // Phase 1: coarse histogram with per-bucket count AND value sum;
    // the boundary-bucket pick carries the count/sum mass before it.
    val hist = df
      .select(g ++ Seq(v.as("__v"), shiftright(v, shift).as("__bucket")): _*)
      .groupBy((g :+ col("__bucket")): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col("__v")).as("__s"))
      .withColumn("__cum", sum(col("__cnt")).over(byBucket))
      .withColumn("__cums", sum(col("__s")).over(byBucket))
      .withColumn("__n", sum(col("__cnt")).over(byGroup))
      .withColumn("__tot", sum(col("__s")).over(byGroup))
    def rankOf(q: Q): Column =
      call_function("div", col("__n") * q.num + (q.den - 1), lit(q.den))
    val bCols = Seq("__blo" -> loQ, "__bhi" -> hiQ).map { case (out, q) =>
      val r = rankOf(q)
      min(when(col("__cum") >= r,
        struct(col("__bucket"), (col("__cum") - col("__cnt")).as("__before"),
          (col("__cums") - col("__s")).as("__bsum"), r.as("__rank")))).as(out)
    } ++ Seq(max(col("__n")).as("__n"), max(col("__tot")).as("__tot"))
    val perGroup = hist.groupBy(g: _*).agg(bCols.head, bCols.tail: _*)
    val boundaries = perGroup.select(
      g :+ explode(array(Seq("lo" -> "__blo", "hi" -> "__bhi").map {
        case (tag, out) =>
          struct(lit(tag).as("__q"),
            col(out).getField("__bucket").as("__bucket"),
            (col(out).getField("__rank") - col(out).getField("__before"))
              .as("__local"))
      }: _*)).as("__b"): _*)
      .select(g ++ Seq(col("__b.__q"), col("__b.__bucket"),
        col("__b.__local")): _*)

    // Phase 2: per-value refine histogram of the two boundary buckets,
    // cumulative in both count and value-weighted sum; the picked row
    // is the bound value plus its within-bucket below/upto mass.
    val byBoundary = Window.partitionBy((g :+ col("__q")): _*)
      .orderBy(col("__v"))
    val refined = df
      .select(g ++ Seq(v.as("__v"), shiftright(v, shift).as("__bucket")): _*)
      .join(broadcast(boundaries), groupCols :+ "__bucket")
      .groupBy((g ++ Seq(col("__q"), col("__local"), col("__v"))): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(byBoundary))
      .withColumn("__cumw", sum(col("__cnt") * col("__v")).over(byBoundary))
      .filter(col("__cum") - col("__cnt") < col("__local") &&
        col("__local") <= col("__cum"))
      .select(g ++ Seq(col("__q"), col("__v"),
        (col("__cum") - col("__cnt")).as("__inb_below_cnt"),
        (col("__cumw") - col("__cnt") * col("__v")).as("__inb_below_sum"),
        col("__cum").as("__inb_upto_cnt"),
        col("__cumw").as("__inb_upto_sum")): _*)

    // Assemble: two refined rows per group → one row via conditional
    // aggregation (each min(when) sees exactly one non-null).
    val asm = refined.groupBy(g: _*).agg(
      min(when(col("__q") === "lo", col("__v"))).as("__lo"),
      min(when(col("__q") === "lo", col("__inb_below_cnt"))).as("__lo_ic"),
      min(when(col("__q") === "lo", col("__inb_below_sum"))).as("__lo_is"),
      min(when(col("__q") === "hi", col("__v"))).as("__hi"),
      min(when(col("__q") === "hi", col("__inb_upto_cnt"))).as("__hi_ic"),
      min(when(col("__q") === "hi", col("__inb_upto_sum"))).as("__hi_is"))
    asm.join(perGroup, groupCols)
      .select(g ++ Seq(
        col("__n").as("n"), col("__lo").as("lo"), col("__hi").as("hi"),
        (col("__tot")
          + col("__lo") * (col("__blo.__before") + col("__lo_ic"))
          - (col("__blo.__bsum") + col("__lo_is"))
          + col("__hi") * (col("__n") - col("__bhi.__before") - col("__hi_ic"))
          - (col("__tot") - col("__bhi.__bsum") - col("__hi_is")))
          .as("wsum")): _*)
  }

  /** Core: exact value at caller-supplied 1-based ranks (each a
    * function of the group's row count n). Output: one row per group,
    * `groupCols ++ rank names ++ __gq_n` (the group row count, for
    * callers that post-process with it).
    */
  private def atRanks(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ranks: Seq[(String, Column => Column)],
      bucketWidth: Long): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(ranks.map(_._1).distinct.size == ranks.size, "duplicate out names")
    require(bucketWidth >= 2 && (bucketWidth & (bucketWidth - 1)) == 0,
      s"bucketWidth must be a power of two >= 2, got $bucketWidth")
    val shift = java.lang.Long.numberOfTrailingZeros(bucketWidth)
    val g = groupCols.map(col)
    val v = col(valueCol)
    val byGroup = Window.partitionBy(g: _*)

    // Phase 1: coarse histogram + per-rank boundary bucket.
    val hist = df.select(g :+ shiftright(v, shift).as("__bucket"): _*)
      .groupBy((g :+ col("__bucket")): _*).agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(byGroup.orderBy(col("__bucket"))))
      .withColumn("__n", sum(col("__cnt")).over(byGroup))
    // The boundary bucket is the SMALLEST bucket whose cumulative count
    // reaches the rank. min over a (bucket, before) struct picks that
    // bucket and carries the count mass before it in the same aggregate.
    val boundaryCols = ranks.map { case (out, rankOf) =>
      val r = rankOf(col("__n"))
      min(when(col("__cum") >= r,
        struct(col("__bucket"), (col("__cum") - col("__cnt")).as("__before"),
          r.as("__rank")))).as(out)
    } :+ max(col("__n")).as("__gq_n")
    val perGroup = hist.groupBy(g: _*).agg(boundaryCols.head, boundaryCols.tail: _*)
    // One row per (group, rank): boundary bucket + rank within it.
    val boundaries = perGroup.select(
      g :+ explode(array(ranks.map { case (out, _) =>
        struct(lit(out).as("__q"), col(out).getField("__bucket").as("__bucket"),
          (col(out).getField("__rank") - col(out).getField("__before"))
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

    refined.groupBy(g: _*).pivot("__q", ranks.map(_._1)).agg(first(col("__v")))
      .join(perGroup.select(g :+ col("__gq_n"): _*), groupCols)
  }
}
