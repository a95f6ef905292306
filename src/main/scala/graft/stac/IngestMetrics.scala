package graft.stac

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Engine-side counters for parity with the reference's `memlog`
  * instrumentation (`_api.py:34-42`: per-batch RSS/CPU logging). Spark's
  * task metrics already carry the equivalents; this listener folds them
  * into a compact report — rows read/written, bytes, and peak single-task
  * execution memory — from which ingest (items/s) and write (MB/s)
  * throughput follow.
  */
final class IngestMetrics extends SparkListener {

  val recordsRead = new AtomicLong(0)
  val bytesRead = new AtomicLong(0)
  val recordsWritten = new AtomicLong(0)
  val bytesWritten = new AtomicLong(0)
  val peakExecutionMemory = new AtomicLong(0)
  val totalCpuNanos = new AtomicLong(0)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      recordsRead.addAndGet(m.inputMetrics.recordsRead)
      bytesRead.addAndGet(m.inputMetrics.bytesRead)
      recordsWritten.addAndGet(m.outputMetrics.recordsWritten)
      bytesWritten.addAndGet(m.outputMetrics.bytesWritten)
      totalCpuNanos.addAndGet(m.executorCpuTime)
      peakExecutionMemory.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
    }
  }

  /** The same counters as [[report]], as one JSON object (for embedding
    * in Bench's single-line output). */
  def json(wallSecs: Double): String = {
    val itemsPerSec = if (wallSecs > 0) recordsRead.get() / wallSecs else 0.0
    val mbPerSec = if (wallSecs > 0) bytesWritten.get() / 1e6 / wallSecs else 0.0
    f"""{"rows_read":${recordsRead.get()},"bytes_read":${bytesRead.get()},""" +
      f""""rows_written":${recordsWritten.get()},"bytes_written":${bytesWritten.get()},""" +
      f""""rows_per_sec":$itemsPerSec%.0f,"write_mb_per_sec":$mbPerSec%.2f,""" +
      f""""peak_task_exec_mem_mb":${peakExecutionMemory.get() / 1e6}%.1f,""" +
      f""""executor_cpu_s":${totalCpuNanos.get() / 1e9}%.1f}"""
  }

  def report(wallSecs: Double): String = {
    val itemsPerSec = if (wallSecs > 0) recordsRead.get() / wallSecs else 0.0
    val mbWritten = bytesWritten.get() / 1e6
    val mbPerSec = if (wallSecs > 0) mbWritten / wallSecs else 0.0
    f"rows_read=${recordsRead.get()} (${itemsPerSec}%.0f rows/s) " +
      f"bytes_read=${bytesRead.get()} rows_written=${recordsWritten.get()} " +
      f"mb_written=$mbWritten%.1f ($mbPerSec%.1f MB/s) " +
      f"peak_task_exec_mem_mb=${peakExecutionMemory.get() / 1e6}%.1f " +
      f"executor_cpu_s=${totalCpuNanos.get() / 1e9}%.1f"
  }
}

object IngestMetrics {
  /** Install a fresh listener on the session. */
  def install(spark: SparkSession): IngestMetrics = {
    val m = new IngestMetrics
    spark.sparkContext.addSparkListener(m)
    m
  }
}
