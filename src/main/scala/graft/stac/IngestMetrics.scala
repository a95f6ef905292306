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

  def snapshot(): IngestMetrics.Snapshot = IngestMetrics.Snapshot(
    recordsRead.get(), bytesRead.get(), recordsWritten.get(),
    bytesWritten.get(), peakExecutionMemory.get(), totalCpuNanos.get())

  /** Reset the peak-memory high-water mark. Unlike the additive counters,
    * the peak can't be delta'd between snapshots — a region-scoped peak
    * needs an explicit reset at the region start (Bench does this so
    * untimed prepare-hook peaks don't leak into the timed counters). */
  def resetPeak(): Unit = peakExecutionMemory.set(0L)

  /** Human-readable counter line (StacDemo). Locale.ROOT — the f
    * interpolator is locale-sensitive and would emit comma decimals on
    * e.g. a de_DE JVM, breaking consumers that parse the line. */
  def report(wallSecs: Double): String = {
    val itemsPerSec = if (wallSecs > 0) recordsRead.get() / wallSecs else 0.0
    val mbWritten = bytesWritten.get() / 1e6
    val mbPerSec = if (wallSecs > 0) mbWritten / wallSecs else 0.0
    def d(fmt: String, v: Double) = String.format(java.util.Locale.ROOT, fmt, Double.box(v))
    s"rows_read=${recordsRead.get()} (${d("%.0f", itemsPerSec)} rows/s) " +
      s"bytes_read=${bytesRead.get()} rows_written=${recordsWritten.get()} " +
      s"mb_written=${d("%.1f", mbWritten)} (${d("%.1f", mbPerSec)} MB/s) " +
      s"peak_task_exec_mem_mb=${d("%.1f", peakExecutionMemory.get() / 1e6)} " +
      s"executor_cpu_s=${d("%.1f", totalCpuNanos.get() / 1e9)}"
  }
}

object IngestMetrics {
  /** Install a fresh listener on the session. */
  def install(spark: SparkSession): IngestMetrics = {
    val m = new IngestMetrics
    spark.sparkContext.addSparkListener(m)
    m
  }

  /** Immutable counter snapshot, for delta accounting around a timed
    * region (peak memory is a high-water mark, not a delta). */
  final case class Snapshot(rowsRead: Long, bytesRead: Long, rowsWritten: Long,
                            bytesWritten: Long, peakMem: Long, cpuNanos: Long) {
    def minus(base: Snapshot): Snapshot = Snapshot(
      rowsRead - base.rowsRead, bytesRead - base.bytesRead,
      rowsWritten - base.rowsWritten, bytesWritten - base.bytesWritten,
      peakMem, cpuNanos - base.cpuNanos)
    def plus(o: Snapshot): Snapshot = Snapshot(
      rowsRead + o.rowsRead, bytesRead + o.bytesRead,
      rowsWritten + o.rowsWritten, bytesWritten + o.bytesWritten,
      math.max(peakMem, o.peakMem), cpuNanos + o.cpuNanos)
  }

  val EmptySnapshot: Snapshot = Snapshot(0L, 0L, 0L, 0L, 0L, 0L)

  /** Render a snapshot as one JSON object, locale-safe. */
  def json(s: Snapshot, wallSecs: Double): String = {
    val itemsPerSec = if (wallSecs > 0) s.rowsRead / wallSecs else 0.0
    val mbPerSec = if (wallSecs > 0) s.bytesWritten / 1e6 / wallSecs else 0.0
    def d(fmt: String, v: Double) = String.format(java.util.Locale.ROOT, fmt, Double.box(v))
    s"""{"rows_read":${s.rowsRead},"bytes_read":${s.bytesRead},""" +
      s""""rows_written":${s.rowsWritten},"bytes_written":${s.bytesWritten},""" +
      s""""rows_per_sec":${d("%.0f", itemsPerSec)},"write_mb_per_sec":${d("%.2f", mbPerSec)},""" +
      s""""peak_task_exec_mem_mb":${d("%.1f", s.peakMem / 1e6)},""" +
      s""""executor_cpu_s":${d("%.1f", s.cpuNanos / 1e9)}}"""
  }
}
