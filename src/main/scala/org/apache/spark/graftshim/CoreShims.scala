package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Core-side bridge (same documented extension technique as
  * `org.apache.spark.sql.graftshim.Shims`): the listener bus is
  * `private[spark]`, but per-query metric attribution needs a flush
  * point — task-end events are posted asynchronously, so a snapshot
  * taken right after an action would race the last tasks' events.
  */
object CoreShims {

  /** Block until every queued listener event has been delivered. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
