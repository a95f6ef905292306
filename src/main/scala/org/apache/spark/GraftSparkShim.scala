package org.apache.spark

import org.apache.spark.sql.SparkSession

/** Bridge into `private[spark]` scheduler internals. Single use: draining
  * the async listener bus so counter reads (graft.stac.IngestMetrics) are
  * deterministic — a fixed sleep can undercount when the bus is backed up
  * after a heavy job, and `LiveListenerBus.waitUntilEmpty` has no public
  * equivalent.
  */
object GraftSparkShim {
  /** Block until every queued listener event has been delivered (or the
    * timeout elapses — best effort on a wedged bus). */
  def drainListenerBus(spark: SparkSession, timeoutMillis: Long = 30000L): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
