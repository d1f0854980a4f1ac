package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` listener-bus draining, so a
  * spec can count Spark JOBS deterministically (listener events are
  * delivered async; asserting a job count without draining races). */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
