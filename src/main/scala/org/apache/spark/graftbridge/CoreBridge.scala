package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** SparkContext.listenerBus is private[spark]; the bench's per-query
  * executor-CPU attribution needs to drain pending stage-completed events
  * between reps (outside the timed region) without a fixed sleep. Same
  * namespace-bridge pattern as org.apache.spark.sql.graftbridge.Bridge. */
object CoreBridge {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => }
}
