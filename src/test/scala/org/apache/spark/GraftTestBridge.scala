package org.apache.spark

/** Test-only `private[spark]` bridge (the GraftBridge pattern, test
  * scope): flush the async listener bus so a TaskEnd-metrics listener
  * observes every task of an action deterministically before the
  * assertion reads its accumulator. */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
