package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to `private[spark] SparkContext.listenerBus`, for draining the
  * async listener bus deterministically after a measured job instead of a
  * fixed sleep (the [[graft.tools.Scale]] task-metric snapshots). Lives in
  * the `org.apache.spark` namespace solely for access — the same pattern
  * as [[org.apache.spark.sql.graft.ColumnBridge]].
  */
object ListenerBridge {
  /** Block until every queued listener event is delivered, or the timeout
    * elapses (a timeout degrades to the old fixed-wait behaviour rather
    * than failing the measurement run). */
  def drain(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
