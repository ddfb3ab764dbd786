package graft

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * O3: live progress/throughput metrics — the Spark-native replacement of the
 * reference's throttled status bar (reference: statusbar/status.py:16-48,
 * bag_parser.py:480-491, refresh <= 2 Hz).
 *
 * A SparkListener accumulates records/bytes from every finished task;
 * `report()` (or the auto-printer) renders rows/s. Listener callbacks are on
 * the scheduler event loop — O(1) atomic updates only, so it is safe on a
 * 1000-executor cluster where thousands of tasks finish per second.
 */
final class Progress private (label: String) extends SparkListener {

  private val records = new AtomicLong(0)
  private val bytes = new AtomicLong(0)
  private val startedAtNs = System.nanoTime()
  private val lastPrintNs = new AtomicLong(0)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      records.addAndGet(m.inputMetrics.recordsRead)
      bytes.addAndGet(m.inputMetrics.bytesRead)
      maybePrint()
    }
  }

  /** Throttled console line, mirroring the reference's 0.5 s refresh. */
  private def maybePrint(): Unit = {
    val now = System.nanoTime()
    val last = lastPrintNs.get()
    if (now - last > 500L * 1000 * 1000 && lastPrintNs.compareAndSet(last, now))
      Log.info(report())
  }

  def recordsRead: Long = records.get()

  def report(): String = {
    val secs = math.max(1e-9, (System.nanoTime() - startedAtNs) / 1e9)
    val r = records.get()
    f"$label: $r%,d records in $secs%.1f s (${r / secs}%,.0f rows/s, ${bytes.get() / secs / 1e6}%.1f MB/s)"
  }
}

object Progress {
  private val active = new AtomicReference[(SparkSession, Progress)](null)

  /** Attach a fresh progress listener; detaches any previous one. */
  def attach(spark: SparkSession, label: String = "progress"): Progress = {
    detach()
    val p = new Progress(label)
    spark.sparkContext.addSparkListener(p)
    active.set((spark, p))
    p
  }

  def detach(): Unit = {
    val prev = active.getAndSet(null)
    if (prev != null) prev._1.sparkContext.removeSparkListener(prev._2)
  }
}
