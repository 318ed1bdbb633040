package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, functions}

/** Typed element-wise vector-sum aggregator (§2.9 UDAF surface):
  * `groupBy(k).agg(VectorSumAgg(v))` sums `array<bigint>` columns
  * component-wise — the centroid-accumulation primitive of k-means/IVF
  * training.
  *
  * Why a typed `Aggregator` (SURVEY §7.5 preference order): no built-in
  * aggregate sums arrays ACROSS rows — the built-in route is
  * posexplode → groupBy(key, dim) → sum → re-collect, which multiplies
  * shuffle rows by the dimension (64× here) and needs a second
  * aggregation to reassemble the array. This aggregator keeps the
  * partial sums packed: one buffer array per group per partition,
  * merged pairwise — the map-side-combine shape Spark's own sum enjoys.
  * VectorAggSpec proves value-parity with the explode formulation.
  *
  * Exact integer math throughout (inputs are 1e6-quantized unit
  * vectors: |Σx| per dim ≤ corpus × 1e6, far below 2^63), so results
  * are order-independent and oracle-checkable.
  */
object VectorSumAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def add(b: Array[Long], a: Seq[Long]): Array[Long] =
    if (a == null) b
    else if (b.length == 0) a.toArray
    else {
      require(b.length == a.length,
        s"vector_sum: dimension mismatch (${b.length} vs ${a.length})")
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }

  override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = add(b, a)

  // An empty buffer means "no rows seen on this side" (e.g. a partition
  // whose inputs were all null) — identity, not a 0-dim vector.
  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.length == 0) y
    else if (y.length == 0) x
    else add(x, y.toSeq)

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()

  /** Column form, e.g. `df.groupBy("k").agg(VectorSumAgg(col("v")))`. */
  def apply(v: Column): Column = functions.udaf(VectorSumAgg).apply(v)
}
