package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

import graft.engine.{ChangeFeed, Manifest}

/** `spark.readStream.format("graft")` — the NAMED streaming change-data
  * source (round 18), the read-side symmetry of round 17's named sink.
  * Reading a graft table as a stream previously required knowing the
  * helper API ([[GraftStreaming.changeFeedStream]]); this registers the
  * same semantics as a source any stream can name:
  *
  * {{{
  *   spark.readStream.format("graft")
  *     .option("path", tablePath)       // or .option("table", "cat.ns.t")
  *     .option("keyCols", "id,day")     // the table's unique key
  *     .option("consumerId", "sync_pg") // durable offset (recommended)
  *     .option("startingVersion", "0")  // 0 = whole snapshot as inserts
  *     .load()
  * }}}
  *
  * Rows carry the table's columns plus `_change_type` ∈ insert | delete
  * | update_preimage | update_postimage ([[ChangeFeed.changes]]).
  *
  * Offsets ARE manifest versions: `getOffset` reads the current
  * committed version (one tiny metadata read — a trigger moves only
  * when the table does), and `getBatch(v1, v2)` is the `(v1, v2]`
  * change classification — O(delta files), never the table, and
  * deterministic for a retained version range, which is exactly what
  * micro-batch replay-on-recovery needs. Keep the slowest consumer's
  * version retained (`vacuum` keep / retainMillis, or a snapshot
  * lease).
  *
  * Exactly-once: with a `consumerId`, the durable per-consumer offset
  * beside the manifests ([[ChangeFeed.seekConsumer]]) advances in
  * `commit()` — AFTER the batch is fully processed — and a fresh
  * checkpoint (checkpoint LOSS included) resumes from it instead of
  * re-delivering committed ranges: zero duplicate change rows, the same
  * contract StreamingSpec proves for the helper API. Without a
  * `consumerId` the stream is checkpoint-scoped only (a lost checkpoint
  * replays from `startingVersion`). Two streams must not share one
  * `consumerId` (they would race one offset file).
  */
class GraftSource(spark: SparkSession, path: String, keyCols: Seq[String],
    consumerId: Option[String], startingVersion: Long) extends Source {

  require(Manifest.currentVersion(spark, path).nonEmpty,
    s"graft source: $path is not a manifest-managed table")

  // The durable pointer advances from COMPLETED-batch progress events
  // (see [[GraftSourceProgress]]): register the listener before this
  // query can start, and drain the async listener bus so a
  // back-to-back run (stop stream, start a new one) reads the pointer
  // the previous run's last batch earned.
  consumerId.foreach { _ =>
    GraftSourceProgress.ensureListener(spark)
    org.apache.spark.graftshim.CoreShims
      .drainListenerBus(spark.sparkContext)
  }

  override val schema: StructType = GraftSource.feedSchema(spark, path)

  private def version(o: Offset): Long = o.json.toLong

  override def getOffset: Option[Offset] =
    Manifest.currentVersion(spark, path).map(GraftSourceOffset)

  /** The stream's zero point when the checkpoint has no prior offset:
    * the durable consumer pointer if one exists (checkpoint-loss
    * recovery), else the caller's `startingVersion`.
    */
  private def initialVersion: Long =
    consumerId.flatMap(ChangeFeed.consumerOffset(spark, path, _))
      .getOrElse(startingVersion)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val vFrom = start.map(version).getOrElse(initialVersion)
    val vTo = version(end)
    val changes = ChangeFeed.changes(spark, path, math.min(vFrom, vTo),
      vTo, keyCols)
    org.apache.spark.sql.graftshim.Shims.streamingBatchDf(
      changes.select(schema.fieldNames.map(col).toIndexedSeq: _*))
  }

  /** Engine-driven commit (fires on the NEXT batch's construction and
    * on same-checkpoint restart — NOT after the last batch of an
    * AvailableNow run, which is why [[GraftSourceProgress]] exists).
    * Monotonic: never regresses a pointer a progress event advanced.
    */
  override def commit(end: Offset): Unit =
    consumerId.foreach(GraftSourceProgress.advance(spark, path, _,
      version(end)))

  override def stop(): Unit = ()

  override def toString: String =
    consumerId.fold(s"GraftSource[$path]")(c =>
      s"GraftSource[$path, consumer=$c]")
}

/** Advances the durable consumer pointer from streaming PROGRESS
  * events — emitted only for COMPLETED batches, so a batch that fails
  * mid-run advances nothing. This is the hook that covers the case
  * the engine's `Source.commit` misses: MicroBatchExecution commits
  * batch N's offsets while CONSTRUCTING batch N+1, so the last batch
  * of an AvailableNow run would otherwise never reach the pointer and
  * a checkpoint-loss replay would re-deliver it.
  */
private[streaming] object GraftSourceProgress {

  private val DescRe =
    """GraftSource\[(.+), consumer=([A-Za-z0-9_.-]+)\]""".r

  private val installed = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      java.lang.Boolean]())

  def advance(spark: SparkSession, path: String, consumerId: String,
      v: Long): Unit = {
    val cur = ChangeFeed.consumerOffset(spark, path, consumerId)
      .getOrElse(-1L)
    if (v > cur) ChangeFeed.seekConsumer(spark, path, consumerId, v)
  }

  def ensureListener(spark: SparkSession): Unit =
    if (installed.add(spark))
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit =
            e.progress.sources.foreach { sp =>
              (Option(sp.description), Option(sp.endOffset)) match {
                case (Some(DescRe(path, consumer)), Some(end)) =>
                  end.trim.toLongOption
                    .foreach(advance(spark, path, consumer, _))
                case _ => ()
              }
            }
        })
}

/** Version-as-offset. After a restart the engine hands back a
  * SerializedOffset wrapping this json — every consumer above parses
  * through `Offset.json`, so both shapes read identically.
  */
final case class GraftSourceOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

object GraftSource {

  /** The feed's schema: the table's current snapshot schema plus the
    * `_change_type` tag column.
    */
  def feedSchema(spark: SparkSession, path: String): StructType =
    Manifest.read(spark, path).schema.add(ChangeFeed.ChangeCol,
      StringType, nullable = false)

  /** Resolve the streamed table from source options: `path`, or
    * `table` = `<catalog>.<namespace>.<table>` through the registered
    * graft catalog's root (the same resolution as
    * [[GraftStreaming.changeFeedStreamByName]]).
    */
  def resolvePath(spark: SparkSession,
      parameters: Map[String, String]): String =
    parameters.get("path").getOrElse {
      val name = parameters.getOrElse("table",
        throw new IllegalArgumentException(
          "graft source needs .option(\"path\", <table dir>) or " +
            ".option(\"table\", \"<catalog>.<namespace>.<table>\")"))
      val parts = name.split("\\.")
      require(parts.length == 3,
        s"expected <catalog>.<namespace>.<table>, got '$name'")
      val root = spark.conf.getOption(s"spark.sql.catalog.${parts(0)}.root")
        .getOrElse(throw new IllegalArgumentException(
          s"no catalog '${parts(0)}' registered — set " +
            s"spark.sql.catalog.${parts(0)} / .root"))
      graft.catalog.GraftPaths.tablePath(root, parts(1), parts(2))
    }

  def keyCols(parameters: Map[String, String]): Seq[String] = {
    val raw = parameters.getOrElse("keyCols",
      parameters.getOrElse("keycols",
        throw new IllegalArgumentException(
          "graft source needs .option(\"keyCols\", \"k1,k2\") — the " +
            "table's unique key, for change classification")))
    raw.split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq
  }
}
