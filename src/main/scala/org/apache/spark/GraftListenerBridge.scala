package org.apache.spark

/**
 * Listener-bus drain bridge. `SparkContext.listenerBus` is
 * `private[spark]`, but a deterministic test of asynchronous listener
 * effects (e.g. `Scale.releaseAfterUse`'s deferred unpersist, which rides
 * the ExecutionListenerBus on the shared LiveListenerBus) needs to wait
 * until queued events have been dispatched before asserting on storage
 * state — hence this one-call package shim, the same pattern as
 * `org.apache.spark.sql.GraftBridge`.
 */
object GraftListenerBridge {
  /** Block until every queued listener event has been dispatched (or the
    * timeout elapses, throwing). */
  def waitForListeners(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
