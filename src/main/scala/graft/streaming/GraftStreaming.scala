package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.engine.Upsert
import graft.ingest.OdsBuilder

/** Structured-Streaming restatement of the reference's daily cadence
  * (SURVEY §2.8): the cron + sensor choreography
  * (`raw_from_api_to_s3.py:70`, `transformed_from_s3_to_pg.py:119-126`)
  * becomes a file-source stream over the raw landing directory with
  * `Trigger.AvailableNow()` — each invocation drains exactly the files
  * that have arrived, then stops; the checkpoint remembers processed
  * files, and the idempotent ODS upsert makes replays no-ops even if the
  * checkpoint is lost. Event-time windows with watermarks cover the
  * late-data surface the reference cannot express.
  *
  * Scale notes: the file source lists only new files per batch;
  * `foreachBatch` reuses the BATCH OdsBuilder/Upsert plans, so streaming
  * inherits their partitioning/pruning properties. Watermarked windowed
  * aggregation is Spark's incremental stateful operator — state is keyed
  * by (window, event_type), bounded by the watermark horizon.
  */
object GraftStreaming {

  /** Daily-drop ingest: landing dir → deduped, date-partitioned ODS.
    * One call ≙ one reference DAG run.
    */
  def dailyDropIngest(spark: SparkSession, landingRoot: String,
      odsPath: String, checkpoint: String): StreamingQuery = {
    val raw = spark.readStream
      .option("multiLine", value = true)
      .schema(OdsBuilder.rawSchema)
      .json(s"$landingRoot/*/*.json")
    raw.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Upsert.upsertPartitioned(spark, odsPath, OdsBuilder.toOds(batch),
          Seq("song_rank", "source_date", "country"), "source_date")
        ()
      }
      .start()
  }

  /** EXACTLY-ONCE streaming append INTO THE LAKE — the manifest-ledger
    * twin of [[martPublishStream]]'s JDBC epoch publish, for event-log
    * streams with no natural key worth enforcing: each trigger's rows
    * land via [[graft.engine.Upsert.appendEpoch]], whose
    * (appId → batchId) marker rides inside the atomically-renamed
    * manifest commit. A failure-retried batch (or a full replay under
    * the same checkpoint lineage) is detected by one metadata read and
    * skipped — no anti-join data scan per trigger, no duplicates, and
    * readers see each batch all-or-nothing (manifest snapshot
    * isolation). Same ledger caveat as every transactional sink:
    * deleting the checkpoint restarts batchIds at 0, which the marker
    * will skip — a deliberate reprocess needs a fresh appId or table.
    */
  def appendLogStream(events: DataFrame, path: String, dateCol: String,
      appId: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Upsert.appendEpoch(batch.sparkSession, path, batch,
          Some(dateCol), appId, batchId)
        ()
      }
      .start()

  /** STREAMING CDC-TO-MART MAINTENANCE LOOP (round 13): keep a derived
    * mart — and optionally its JDBC replica — continuously caught up
    * with a manifest-managed source table, end-to-end exactly-once.
    * The reference's equivalent is the Airflow sensor chain re-running
    * the day's mart SQL after each load (`transformed_from_s3_to_pg
    * .py:119-126`); here the engine itself knows what changed.
    *
    * Composition of three independently idempotent legs:
    *
    *  1. **Change detection** — the stream TAILS THE SOURCE'S MANIFEST
    *     (`_graft_manifest/v*.list` as a file source): each committed
    *     version is one new tiny text file, so a trigger fires exactly
    *     when the source changes, reading bytes proportional to the
    *     manifest, never the data. The batch CONTENT is deliberately
    *     ignored — it is only the wake-up signal.
    *  2. **Mart refresh** — [[graft.engine.Incremental.refresh]]
    *     recomputes ONLY the partitions whose live file set moved
    *     (manifest diff against the mart's own bookmark) and swaps
    *     them in via dynamic partition overwrite.
    *  3. **Replica publish** — [[graft.engine.CdcSync.syncReplica]]
    *     applies the MART's net change feed to the JDBC replica, the
    *     offset CASed forward in the same transaction as the rows.
    *
    * Exactly-once does NOT rest on the stream checkpoint: legs 2 and 3
    * each carry their own transactional offset (mart bookmark, replica
    * offset row), so deleting the checkpoint and replaying every
    * trigger produces zero duplicate rows — replays are detected
    * no-ops. The checkpoint only prevents redundant wake-ups.
    *
    * `compute` must be per-partition decomposable over `dateCol` (see
    * [[graft.engine.Incremental]]). `keyCols` is the mart's full
    * grouping key — the replica's primary key.
    */
  def martMaintainStream(spark: SparkSession, sourcePath: String,
      martPath: String, dateCol: String, keyCols: Seq[String],
      checkpoint: String,
      publishTo: Option[(String, String)] = None,
      trigger: Trigger = Trigger.AvailableNow())(
      compute: DataFrame => DataFrame): StreamingQuery =
    spark.readStream
      .text(s"$sourcePath/_graft_manifest/v*.list")
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: DataFrame, _: Long) =>
        val s = spark
        graft.engine.Incremental.refresh(s, sourcePath, martPath,
          dateCol)(compute)
        publishTo.foreach { case (url, table) =>
          graft.engine.CdcSync.syncReplica(s, martPath, keyCols, url, table)
        }
        ()
      }
      .start()

  /** PUBLIC STREAMING CHANGE-DATA FEED over a manifest-managed table
    * (round 14; the user-facing sibling of [[martMaintainStream]]'s
    * internal manifest tailing): tail the source's manifest directory as
    * a file-source stream — one tiny text file per committed version, so
    * a trigger fires exactly when the table changes and reads bytes
    * proportional to the manifest, never the data — and deliver each
    * newly committed version range as row-level changes
    * ([[graft.engine.ChangeFeed.changes]]: `_change_type` ∈ insert |
    * delete | update_preimage | update_postimage) to `sink`.
    *
    * Exactly-once does NOT rest on the stream checkpoint: the consumer's
    * offset is a DURABLE file beside the manifests, advanced only after
    * `sink` returns ([[graft.engine.ChangeFeed.consumeNew]]) — deleting
    * the checkpoint and replaying every trigger delivers zero duplicate
    * change rows (StreamingSpec proves it). The checkpoint only prevents
    * redundant wake-ups. First delivery (new consumer) is the whole
    * current snapshot as `insert`s; `ChangeFeed.seekConsumer` repositions.
    * `keyCols` must be a unique key of the table (the upsert key).
    */
  def changeFeedStream(spark: SparkSession, sourcePath: String,
      keyCols: Seq[String], consumerId: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow())(
      sink: DataFrame => Unit): StreamingQuery =
    spark.readStream
      .text(s"$sourcePath/_graft_manifest/v*.list")
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: DataFrame, _: Long) =>
        graft.engine.ChangeFeed.consumeNew(spark, sourcePath, keyCols,
          consumerId)(sink)
        ()
      }
      .start()

  /** [[changeFeedStream]] addressed by CATALOG TABLE NAME
    * (`<catalog>.<namespace>.<table>`) instead of a path — the SQL-side
    * consumer's entry point: resolve the warehouse path through the
    * registered [[graft.catalog.GraftCatalog]]'s root and tail the same
    * manifest stream.
    */
  def changeFeedStreamByName(spark: SparkSession, tableName: String,
      keyCols: Seq[String], consumerId: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow())(
      sink: DataFrame => Unit): StreamingQuery = {
    val parts = tableName.split("\\.")
    require(parts.length == 3,
      s"expected <catalog>.<namespace>.<table>, got '$tableName'")
    val root = spark.conf.getOption(s"spark.sql.catalog.${parts(0)}.root")
      .getOrElse(throw new IllegalArgumentException(
        s"no catalog '${parts(0)}' registered — set " +
          s"spark.sql.catalog.${parts(0)} / .root"))
    val path = graft.catalog.GraftPaths.tablePath(root, parts(1), parts(2))
    require(graft.engine.Manifest.currentVersion(spark, path).nonEmpty,
      s"$tableName ($path) is not a manifest-managed table")
    changeFeedStream(spark, path, keyCols, consumerId, checkpoint,
      trigger)(sink)
  }

  /** Streaming mart publish with EXACTLY-ONCE landing: each trigger's
    * aggregate slice goes through [[graft.engine.JdbcSink.publishEpoch]]
    * keyed by the `foreachBatch` batchId, so a failure-retried batch (or
    * a full replay under the same checkpoint lineage) lands zero
    * duplicate rows — the streaming restatement of the reference's
    * daily Postgres mart append, with the transactional guarantee the
    * reference gets from Postgres MVCC. `update` output mode: only
    * groups the trigger changed are re-emitted, and publishEpoch
    * replaces exactly those — `sliceCols` must therefore be the mart's
    * FULL grouping key (see its scaladoc).
    *
    * Ledger caveat (standard epoch-ledger semantics): batchIds restart
    * at 0 when the CHECKPOINT is deleted, and the ledger will then skip
    * them as already-committed — a deliberate reprocess needs a fresh
    * target table or a cleared `graft_epochs` row set, which is the
    * same discipline every transactional sink requires.
    */
  def martPublishStream(mart: DataFrame, url: String, table: String,
      sliceCols: Seq[String], checkpoint: String): StreamingQuery =
    mart.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.engine.JdbcSink.publishEpoch(batch, url, table, sliceCols,
          batchId)
        ()
      }
      .start()

  /** Tumbling-window event counts + exact value sums. Works in BOTH
    * batch (the oracle-checked `q_window_hourly`; `withWatermark` is a
    * no-op there) and streaming (watermark bounds state and drops late
    * rows). Money-math discipline: values are summed as exact integer
    * cents and converted to double once (QueryDef.dec rationale).
    */
  def windowedEventStats(events: DataFrame, windowLen: String,
      watermark: String = "30 minutes"): DataFrame = {
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
    events.withWatermark("ts", watermark)
      .select(col("ts"), col("event_type"), cents.as("cents"))
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("cents")).cast("double") / 100).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Sliding-window variant (length 2×slide): every event contributes to
    * two windows — the overlap shape the reference has no analogue for.
    */
  def slidingEventCounts(events: DataFrame, length: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), length, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Streaming exact dedup — the continuous counterpart of
    * `q_dedup_exact` / the ODS `ON CONFLICT DO NOTHING` key: first
    * arrival per key is emitted, replays/duplicates are dropped. The
    * 100 TB property is the `WithinWatermark` variant: key state is
    * EVICTED once the watermark passes it, so state is O(keys per
    * watermark horizon), not O(stream history) — a plain streaming
    * `dropDuplicates` would grow without bound.
    */
  def dedupStream(events: DataFrame, keys: Seq[String],
      eventTimeCol: String = "ts", watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream LEFT OUTER interval join: each purchase attributed
    * the same user's clicks in the `lookback` window ending at the
    * purchase. The time-bound condition plus both-side watermarks is
    * exactly what makes an outer stream-stream join FEASIBLE: Spark can
    * prove when a purchase can no longer match (its watermark passes
    * p_ts) and emit the null-padded row, and can evict click state older
    * than the lookback horizon — state is O(events per horizon), not
    * O(stream history). Runs identically in batch (watermarks are
    * no-ops) — `q_click_attribution` hash-checks the join semantics
    * against DuckDB.
    */
  def clickAttribution(purchases: DataFrame, clicks: DataFrame,
      lookback: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame = {
    val p = purchases.select(col("event_id").as("p_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val c = clicks.select(col("event_id").as("c_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookback") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
  }

  /** Stream-static dim enrichment — the streaming restatement of the
    * J2-J4 mart joins: an unbounded event stream LEFT-joined against a
    * bounded dimension. Stateless by construction (the static side is
    * finite, so no watermark and no join state accumulate); per
    * micro-batch it plans as the same broadcast hash join the batch
    * marts use.
    *
    * Dim-freshness contract: a file-backed static side snapshots its
    * file listing when the query is PLANNED — an in-place overwrite
    * under a running query is a FILE_NOT_EXIST race, not a swap. Under
    * this engine's AvailableNow daily cadence each day's invocation is
    * a fresh plan, so the StarBuilder dim swap lands between runs:
    * fact stream state (checkpoint) carries over, the dim is re-read —
    * the slowly-changing-dim story without a transactional source.
    */
  def dimEnrich(events: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Continuous corpus ingestion with near-dup admission: JSONL document
    * drops stream in (AvailableNow — one call drains the arrived files),
    * and each micro-batch passes through [[graft.engine.DedupGate]]
    * against the already-admitted store before appending — the streaming
    * restatement of the `ON CONFLICT DO NOTHING` contract at near-dup
    * (MinHash-LSH) granularity. Because the gate rejects anything
    * near-dup to the admitted corpus — including a document's own
    * earlier copy — replays are no-ops EVEN IF THE CHECKPOINT IS LOST
    * (StreamingSpec proves it), the same defense-in-depth the batch
    * Upsert path gives the ODS.
    *
    * Scale: per batch, cost is O(drop) signatures plus a band-bucket
    * join against the admitted side; at 100 TB the admitted BAND INDEX
    * is what you persist and upsert (DedupGate scaladoc) rather than
    * re-deriving it from the store, and the admitted store itself is
    * date-partitioned. Single-writer discipline as everywhere (README).
    */
  def corpusDropAdmit(spark: SparkSession, dropRoot: String,
      admittedPath: String, checkpoint: String): StreamingQuery = {
    import org.apache.spark.sql.types._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val incoming = spark.readStream.schema(docSchema).json(s"$dropRoot/*.jsonl")
    incoming.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val hPath = new org.apache.hadoop.fs.Path(admittedPath)
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val existing =
          if (fs.exists(hPath)) spark.read.schema(docSchema).parquet(admittedPath)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docSchema)
        graft.engine.DedupGate.admit(existing, batch)
          .write.mode("append").parquet(admittedPath)
        ()
      }
      .start()
  }
}
