package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming first-wins dedup via `transformWithState` (Spark 4's
  * arbitrary-state API, the successor to mapGroupsWithState) — the
  * reference's `ON CONFLICT DO NOTHING` idempotency contract
  * (`transformed_from_s3_to_pg.py:146-151`) restated as keyed streaming
  * state: the first record per business key passes, every replay within
  * the retention window is dropped, and an EVENT-TIME TIMER evicts the
  * key once the watermark passes first-seen + retention.
  *
  * Positioning vs the declarative twin [[GraftStreaming.dedupStream]]
  * (`dropDuplicatesWithinWatermark`): the declarative form is preferred
  * when plain event-time dedup is all that's needed; the processor form
  * is the template for when per-key logic grows beyond it (conflict
  * resolution, first-AND-count emission, cross-field merge) — state and
  * expiry become explicit and composable.
  *
  * Why event-time timers and not `TTLConfig` processing-time TTL: TTL is
  * wall-clock (retention would depend on job uptime, and replaying
  * history re-admits duplicates), and a processing-time clock forces the
  * engine to keep running empty micro-batches to advance it. Watermark
  * timers expire in data time — deterministic under replay, and idle
  * streams stay idle.
  *
  * Scale: state is one boolean + one timer per key, evicted at
  * watermark + retention — O(keys per retention window), never O(stream
  * history). Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`); transformWithState
  * is not supported on the default HDFS-backed store.
  */
object KeyedStateDedup {

  final case class KeyedEvent(key: String, ts: Timestamp, payload: Double)

  /** First-wins per key; duplicates dropped until the key's event-time
    * timer (first-seen + retentionMs) fires and clears the state.
    */
  class DedupProcessor(retentionMs: Long)
      extends StatefulProcessor[String, KeyedEvent, KeyedEvent] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[KeyedEvent] = {
      // rows: every record for this key in the micro-batch. A known key
      // drops them all; a new key emits exactly one record and schedules
      // its eviction. "First" is the EVENT-TIME minimum (payload as a
      // total-order tiebreak), not iterator arrival order — arrival
      // order depends on shuffle interleaving across source partitions,
      // and both the emitted row and the eviction anchor must be
      // replay-deterministic.
      if (seen.exists() || !rows.hasNext) Iterator.empty
      else {
        val first = rows.minBy(e => (e.ts.getTime, e.payload))
        seen.update(true)
        getHandle.registerTimer(first.ts.getTime + retentionMs)
        Iterator.single(first)
      }
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[KeyedEvent] = {
      seen.clear()
      Iterator.empty
    }
  }

  /** `watermarkDelay` bounds how late a record may arrive;
    * `retentionMinutes` bounds how long a key blocks its replays.
    */
  def dedup(events: Dataset[KeyedEvent], retentionMinutes: Int = 60,
      watermarkDelay: String = "0 seconds"): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .transformWithState(new DedupProcessor(retentionMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
