package org.apache.spark

/** Test-only bridge into `private[spark]` executor introspection:
  * ClusterShapeSpec's executor-kill test needs the live executor id list
  * (`SparkContext.getExecutorIds` is private[spark]; the public
  * `killExecutors` takes those ids). Test classpath only — never ships. */
object GraftTestBridge {
  def executorIds(sc: SparkContext): Seq[String] = sc.getExecutorIds()
}
