package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming burst detection via `transformWithState` ListState: flag a
  * key whose event rate exceeds `threshold` events within a sliding
  * `windowMs` — the bot/abuse/rate-anomaly gate a training-data ingest
  * runs on its event firehose (complementing [[KeyedStateDedup]]'s
  * ValueState shape with the buffered-state one).
  *
  * State per key: the event-time stamps still inside the window (a
  * ListState pruned on every update) plus a high-water mark, with an
  * event-time timer that clears state for keys gone idle past the
  * window — state is O(events per window per key), never O(stream
  * history). A burst row is emitted each micro-batch in which the
  * key's in-window count reaches the threshold.
  *
  * Determinism: the emitted count/window bounds depend only on the SET
  * of events inside the window, not on arrival interleaving — buffers
  * are sorted before pruning, and the window anchors to the maximum
  * event time seen for the key.
  *
  * Requires the RocksDB state store provider, like every
  * transformWithState operator.
  */
object BurstDetector {

  final case class KeyedTick(key: String, ts: Timestamp)
  final case class Burst(key: String, n_events: Long,
      window_start: Timestamp, window_end: Timestamp)

  class BurstProcessor(windowMs: Long, threshold: Int)
      extends StatefulProcessor[String, KeyedTick, Burst] {
    @transient private var recent: ListState[Long] = _
    @transient private var hiWater: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[Long]("recent", Encoders.scalaLong,
        TTLConfig.NONE)
      hiWater = getHandle.getValueState[Long]("hiWater", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[KeyedTick],
        timerValues: TimerValues): Iterator[Burst] = {
      val incoming = rows.map(_.ts.getTime).toArray
      if (incoming.isEmpty) return Iterator.empty
      val all = (recent.get().toArray ++ incoming).sorted
      val hi = all.last
      // sliding window anchored at the key's newest event
      val kept = all.filter(_ > hi - windowMs)
      recent.clear()
      recent.put(kept)
      // re-arm the idle-cleanup timer at the new high-water mark
      if (hiWater.exists()) getHandle.deleteTimer(hiWater.get() + windowMs)
      hiWater.update(hi)
      getHandle.registerTimer(hi + windowMs)
      if (kept.length >= threshold)
        Iterator.single(Burst(key, kept.length.toLong,
          new Timestamp(kept.head), new Timestamp(hi)))
      else Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Burst] = {
      // the key has been idle a full window: nothing left to count
      recent.clear()
      hiWater.clear()
      Iterator.empty
    }
  }

  def detect(events: Dataset[KeyedTick], windowMinutes: Int, threshold: Int,
      watermarkDelay: String = "0 seconds"): Dataset[Burst] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .transformWithState(
        new BurstProcessor(windowMinutes * 60000L, threshold),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
