package org.apache.spark

/** Test-only escape hatch: `LiveListenerBus.waitUntilEmpty` is
  * `private[spark]`, but metric-asserting specs (graft.MetricsProbe) must
  * drain the async listener bus before reading what their listener
  * accumulated — otherwise task-end events raced by the assertion make the
  * measurements flaky. Same trick Spark's own test utilities use.
  */
object GraftBusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
