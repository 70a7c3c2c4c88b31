package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Listener-bus drain bridge (`SparkContext.listenerBus` is
  * `private[spark]`). Stage-completion events are posted
  * asynchronously; a profiler that snapshots a listener's buffer right
  * after an action returns can miss the final stages of that very job.
  * `drain` blocks until every queued event has been delivered, making
  * the snapshot complete — the same call Spark's own test harness uses
  * for exactly this race.
  */
object ListenerBridge {
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () } // best-effort: never fail a bench
}
