package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.engine.Upsert

/** `.writeStream.format("graft")` — the NAMED exactly-once table sink
  * (round 17). The proven pattern was `foreachBatch` +
  * [[Upsert.appendEpoch]] ([[GraftStreaming.appendLogStream]]), which
  * works but requires the caller to know the epoch-ledger idiom; this
  * registers the same semantics as a sink any stream can name:
  *
  * {{{
  *   events.writeStream.format("graft")
  *     .option("path", tablePath)          // the manifest-managed table
  *     .option("dateCol", "d")             // optional partition column
  *     .option("appId", "orders_feed")     // ledger identity (default
  *                                         //   "graft_sink")
  *     .option("checkpointLocation", cp)
  *     .start()
  * }}}
  *
  * Each micro-batch lands through [[Upsert.appendEpoch]]: the
  * (appId → batchId) marker rides INSIDE the atomically-renamed
  * manifest commit, so a failure-retried batch — or a full replay after
  * CHECKPOINT LOSS re-delivering the same batchIds — is detected by one
  * metadata read and skipped. Readers see each batch all-or-nothing.
  *
  * Ledger caveats (same as every transactional sink): two DIFFERENT
  * streams appending to one table need distinct `appId`s (they would
  * otherwise share a batchId ledger), and a deliberate full reprocess
  * needs a fresh appId — replayed batchIds are skipped by design.
  * Append-only: aggregations belong in `foreachBatch` with the keyed
  * upsert verbs.
  *
  * Implementation note: this is the classic V1 `Sink` seam — `addBatch`
  * hands the micro-batch as a DataFrame, exactly the shape
  * `appendEpoch` wants. The incoming frame is re-based onto its
  * already-computed RDD first ([[org.apache.spark.sql.graftshim.Shims
  * .freshBatchDf]]): a streaming-internal frame must not be re-planned
  * by the multiple actions a verb may take.
  */
class GraftSinkProvider extends StreamSinkProvider
    with StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  // ---- the source half (round 18): spark.readStream.format("graft")
  // — change-data-feed rows off the manifest versions; semantics and
  // options in [[GraftSource]]'s scaladoc

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val path = GraftSource.resolvePath(spark, parameters)
    require(schema.isEmpty,
      "graft source derives its schema from the table's manifest — " +
        "drop the user-specified schema")
    (shortName(), GraftSource.feedSchema(spark, path))
  }

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = GraftSource.resolvePath(spark, parameters)
    val starting = parameters.get("startingVersion")
      .orElse(parameters.get("startingversion")).map(_.toLong)
      .getOrElse(0L)
    val consumerId = parameters.get("consumerId")
      .orElse(parameters.get("consumerid"))
    new GraftSource(spark, path, GraftSource.keyCols(parameters),
      consumerId, starting)
  }

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft sink is append-only (epoch-ledgered appendEpoch); got " +
        s"$outputMode — use foreachBatch with the keyed upsert verbs " +
        "for update/complete shapes")
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft sink needs .option(\"path\", <table dir>) or .start(path)"))
    val dateCol = parameters.get("dateCol").orElse(parameters.get("datecol"))
    val appId = parameters.getOrElse("appId",
      parameters.getOrElse("appid", "graft_sink"))
    new Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        val fresh = org.apache.spark.sql.graftshim.Shims.freshBatchDf(data)
        Upsert.appendEpoch(fresh.sparkSession, path, fresh, dateCol,
          appId, batchId)
        ()
      }
      override def toString: String = s"GraftSink[$path]"
    }
  }
}
