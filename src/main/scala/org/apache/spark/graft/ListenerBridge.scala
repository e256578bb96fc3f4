package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` access bridge for the listener bus — the
  * stage-attribution probe ([[graft.StageProbe]]) must drain the
  * asynchronous event queue between runs or the last stages of run N
  * are attributed to run N+1. Same pattern as
  * [[org.apache.spark.sql.graft.ColumnBridge]].
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
