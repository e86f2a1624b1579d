package graft.io

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.Success

/** A13 perf-log sink: the reference's PerformanceTracker
  * (scraper/performance_tracker.py:95-158) re-expressed on Spark's
  * listener bus. The unit of work there is one HTTP request; here it is
  * one task — the engine's own retry/speculation machinery plays the
  * role of the reference's per-request retries.
  *
  * Counters accumulate lock-free on the listener thread; `logLine`
  * renders the reference's progress JSON (processed / successful /
  * failed / retried / speed + memory), `summaryLine` its end-of-run
  * pipe table. Attach with [[PerfTracker.install]]; dump JSON lines to
  * a file with [[writeLog]].
  */
class PerfTracker extends SparkListener {

  private val startedAtMs = System.currentTimeMillis()
  private val processed = new LongAdder
  private val successful = new LongAdder
  private val failed = new LongAdder
  private val retried = new LongAdder
  private val recordsRead = new LongAdder
  private val recordsWritten = new LongAdder
  private val bytesRead = new LongAdder
  private val bytesWritten = new LongAdder
  private val executorRunTimeMs = new LongAdder
  private val peakTaskMemory = new AtomicLong(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    processed.increment()
    if (taskEnd.reason == Success) successful.increment() else failed.increment()
    if (taskEnd.taskInfo != null && taskEnd.taskInfo.attemptNumber > 0)
      retried.increment()
    val m = taskEnd.taskMetrics
    if (m != null) {
      recordsRead.add(m.inputMetrics.recordsRead)
      recordsWritten.add(m.outputMetrics.recordsWritten)
      bytesRead.add(m.inputMetrics.bytesRead)
      bytesWritten.add(m.outputMetrics.bytesWritten)
      executorRunTimeMs.add(m.executorRunTime)
      peakTaskMemory.accumulateAndGet(m.peakExecutionMemory, math.max)
    }
  }

  case class Snapshot(
      elapsedSec: Double, processed: Long, successful: Long, failed: Long,
      retried: Long, speed: Double, recordsRead: Long, recordsWritten: Long,
      bytesRead: Long, bytesWritten: Long, executorRunTimeMs: Long,
      peakTaskMemoryBytes: Long, jvmHeapUsedMb: Double)

  def snapshot(): Snapshot = {
    val elapsed = math.max(1e-9, (System.currentTimeMillis() - startedAtMs) / 1e3)
    val p = processed.sum()
    val rt = Runtime.getRuntime
    Snapshot(elapsed, p, successful.sum(), failed.sum(), retried.sum(),
      p / elapsed, recordsRead.sum(), recordsWritten.sum(), bytesRead.sum(),
      bytesWritten.sum(), executorRunTimeMs.sum(), peakTaskMemory.get(),
      (rt.totalMemory() - rt.freeMemory()) / 1048576.0)
  }

  /** One JSON perf-log line (the reference's debug-channel record). */
  def logLine(): String = {
    val s = snapshot()
    f"""{"elapsed_sec":${s.elapsedSec}%.3f,"processed":${s.processed},""" +
      s""""successful":${s.successful},"failed":${s.failed},""" +
      s""""retried":${s.retried},"speed":${"%.2f".format(s.speed)},""" +
      s""""records_read":${s.recordsRead},"records_written":${s.recordsWritten},""" +
      s""""bytes_read":${s.bytesRead},"bytes_written":${s.bytesWritten},""" +
      s""""executor_run_time_ms":${s.executorRunTimeMs},""" +
      s""""peak_task_memory_bytes":${s.peakTaskMemoryBytes},""" +
      f""""jvm_heap_used_mb":${s.jvmHeapUsedMb}%.1f}"""
  }

  /** The reference's progress pipe table, task-denominated. */
  def summaryLine(): String = {
    val s = snapshot()
    f"${s.processed}%7d|${s.successful}%7d|${s.failed}%7d|${s.retried}%7d|" +
      f"${s.speed}%10.2f|${s.jvmHeapUsedMb}%9.1f"
  }

  /** Append the current perf line to a local JSON-lines log. */
  def writeLog(path: String): Unit = {
    val w = new java.io.FileWriter(path, true)
    try w.write(logLine() + "\n") finally w.close()
  }
}

object PerfTracker {
  /** Attach a fresh tracker to the session's listener bus. */
  def install(spark: SparkSession): PerfTracker = {
    val t = new PerfTracker
    spark.sparkContext.addSparkListener(t)
    t
  }
}
