package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `SparkContext.listenerBus` (private[spark]): per-query
  * shuffle/spill telemetry snapshots are only exact if the listener bus
  * has delivered every task-end event for the query before the snapshot
  * is read — events post asynchronously, so without a drain the tail of
  * one query's metrics would bleed into the next query's delta.
  */
object ListenerBridge {
  /** Block until all queued listener events are delivered (or timeout). */
  def drain(sc: SparkContext, timeoutMillis: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
