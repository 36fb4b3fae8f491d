package org.apache.spark

/** The listener bus posts task-end events asynchronously; benchmark code
  * that brackets a job with CPU-time snapshots needs the bus drained so
  * the snapshot attributes exactly that job's tasks. `waitUntilEmpty` is
  * private[spark] — this shim exposes it to graft.Bench. */
object GraftListenerBusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
