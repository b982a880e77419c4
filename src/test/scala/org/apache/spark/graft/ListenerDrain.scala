package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark] listenerBus.waitUntilEmpty()` so
  * suites can assert on QueryExecutionListener-collected plans
  * deterministically instead of sleeping. */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
