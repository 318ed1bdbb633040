package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * A warehouse table is usually laid out along ONE sort key; a predicate
  * on any other column then reads every file. Interleaving the low bits
  * of two key columns into a single Morton code and range-partitioning +
  * sorting the write by that code gives every output file a narrow
  * min/max envelope in BOTH dimensions, so the parquet reader's
  * row-group statistics skip most of the table for 2-D box predicates —
  * the standard clustering layout for 100 TB scans (the file count, not
  * the cluster math, is what changes at scale: the code is a pure
  * per-row expression, and the range partitioner samples the z-values
  * exactly like any other sort).
  *
  * Built from composition (SURVEY §7.5 preference (a)): the code is a
  * fold of shift/mask `Column`s — whole-stage-codegen'd arithmetic, no
  * UDF — and the layout is `repartitionByRange` + `sortWithinPartitions`.
  */
object ZOrder {

  /** Bits of each column that survive interleaving (32-bit Morton code
    * for two columns). Keys wider than 16 bits keep their low 16 — for
    * clustering that is the right failure mode: the layout degrades
    * gracefully toward hash-like dispersion instead of overflowing.
    */
  val BitsPerCol = 16

  /** Morton code of two integral columns: bit i of `a` lands at 2i, bit
    * i of `b` at 2i+1. Disjoint bit positions make `+` equivalent to OR.
    */
  def zValue(a: Column, b: Column): Column =
    (0 until BitsPerCol).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)

  /** The same Morton code as ANSI SQL text (for the DuckDB oracle),
    * generated from one definition so the two engines cannot drift.
    */
  def zValueSql(a: String, b: String): String =
    (0 until BitsPerCol).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Z-order clustered write: cluster `df` by the Morton code of two
    * columns into `nFiles` range-partitioned, internally sorted parquet
    * files. The z column itself is plumbing and is not written.
    */
  def clusteredWrite(df: DataFrame, a: String, b: String, nFiles: Int,
      path: String): Unit = {
    val z = zValue(col(a).cast("long"), col(b).cast("long"))
    df.withColumn("__graft_z", z)
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }
}
