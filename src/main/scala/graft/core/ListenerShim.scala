// Lives in an org.apache.spark subpackage solely to reach the
// private[spark] listener-bus drain used for metric attribution. No Spark
// internals are modified.
package org.apache.spark.graftshim

import org.apache.spark.SparkContext

object ListenerShim {
  /** Blocks until queued listener events are delivered (or timeout), so
    * per-query metric deltas read AFTER a query include its stages. */
  def drain(sc: SparkContext, timeoutMs: Long = 5000): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
