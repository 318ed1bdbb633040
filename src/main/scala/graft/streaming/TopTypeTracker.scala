package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-key leaderboard via `transformWithState` MapState: for
  * every user, maintain a map of event_type → running count and emit the
  * user's current top type whenever a micro-batch touches them — the
  * "dominant behavior" feed a personalization or abuse pipeline keeps
  * next to the raw firehose. Completes the `transformWithState` state
  * triptych: ValueState ([[KeyedStateDedup]]), ListState
  * ([[BurstDetector]]), and here the keyed-map shape whose per-subkey
  * point updates are exactly what MapState exists for — a ValueState
  * holding the whole map would rewrite every counter on every event.
  *
  * State per key: one map entry per DISTINCT event type the user has
  * produced (bounded by the type vocabulary, not the event volume) plus
  * a high-water mark driving an idle-eviction event-time timer, so
  * abandoned users age out of the store after `retentionMinutes`.
  *
  * Determinism: counts are commutative, and the emitted leader breaks
  * count ties by the lexicographically smallest type — after any
  * arrival interleaving, the LAST row emitted for a user equals the
  * batch argmax (the q_top_event_type oracle twin).
  *
  * Requires the RocksDB state store provider, like every
  * transformWithState operator.
  */
object TopTypeTracker {

  final case class TypedEvent(key: String, event_type: String, ts: Timestamp)
  final case class TopType(key: String, top_type: String, top_n: Long,
      n_total: Long)

  class TopTypeProcessor(retentionMs: Long)
      extends StatefulProcessor[String, TypedEvent, TopType] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var hiWater: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      hiWater = getHandle.getValueState[Long]("hiWater", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[TopType] = {
      var hi = if (hiWater.exists()) hiWater.get() else Long.MinValue
      var touched = false
      rows.foreach { e =>
        touched = true
        val t = e.event_type
        counts.updateValue(t,
          (if (counts.containsKey(t)) counts.getValue(t) else 0L) + 1L)
        if (e.ts.getTime > hi) hi = e.ts.getTime
      }
      if (!touched) return Iterator.empty
      // slide the idle-eviction timer to the new high-water mark
      if (hiWater.exists()) getHandle.deleteTimer(hiWater.get() + retentionMs)
      hiWater.update(hi)
      getHandle.registerTimer(hi + retentionMs)
      var topType: String = null
      var topN = 0L
      var total = 0L
      counts.iterator().foreach { case (t, n) =>
        total += n
        if (n > topN || (n == topN && (topType == null || t < topType))) {
          topType = t; topN = n
        }
      }
      Iterator.single(TopType(key, topType, topN, total))
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TopType] = {
      // idle past retention: forget the user's counters entirely
      counts.clear()
      hiWater.clear()
      Iterator.empty
    }
  }

  def track(events: Dataset[TypedEvent], retentionMinutes: Int,
      watermarkDelay: String = "0 seconds"): Dataset[TopType] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .transformWithState(
        new TopTypeProcessor(retentionMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
