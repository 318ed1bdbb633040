package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables — the co-located-join tool for 100 TB
  * fact⋈fact work: both sides written with `bucketBy(n, key)` hash-land
  * matching keys in matching buckets, so the join needs NO exchange at
  * read time — the shuffle is paid once at write time and amortized over
  * every subsequent join. The reference has no analogue (Postgres indexes
  * play this role); this is the Spark-native equivalent of its unique-key
  * lookup machinery at warehouse scale.
  *
  * BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — planner sees
    * compatible HashPartitioning on both sides and elides the exchange.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
