package org.apache.spark

/** Test-only bridge: flush the live listener bus so a job-counting
  * SparkListener's events are all delivered before the test asserts.
  * (`SparkContext.listenerBus` is private[spark].) */
object GraftTestListenerBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
