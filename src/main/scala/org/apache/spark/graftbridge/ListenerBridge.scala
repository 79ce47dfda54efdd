package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` listener-bus internals.
  *
  * [[graft.Bench]] reads per-query stage/job counters off a
  * SparkListener; listener events are ASYNC, so the counters are only
  * coherent once the bus has drained. The public API offers no drain —
  * a fixed sleep under-reports on a loaded machine — while
  * `LiveListenerBus.waitUntilEmpty` is exactly the drain, just
  * `private[spark]`. Same bridge pattern as
  * [[org.apache.spark.sql.graftbridge.DatasetBridge]]. */
object ListenerBridge {

  /** Block until every queued listener event has been delivered, or
    * `timeoutMillis` passes (returns normally either way — a bench
    * counter that is a beat behind is telemetry noise, not an error
    * worth failing the suite for). */
  def drain(sc: SparkContext, timeoutMillis: Long = 2000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
