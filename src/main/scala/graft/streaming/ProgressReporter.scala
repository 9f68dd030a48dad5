package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Progress events (SURVEY.md T4; reference events/EventSink,
  * ProgressIndicatingFuture — throughput reporting every 1s or 1M records,
  * docs/reference.md:164-167). Spark-native shape: a SparkListener over task
  * metrics feeding a callback at the reference cadence; `BitImage.summary`
  * renders validity bitsets for the same progress UI.
  */
final class ProgressReporter(
    spark: SparkSession,
    everyRecords: Long = 1000000L,
    everyMillis: Long = 1000L)(onProgress: ProgressReporter.Tick => Unit)
    extends SparkListener with AutoCloseable {

  private val records = new AtomicLong(0)
  private val bytes = new AtomicLong(0)
  private val lastReportAtRecords = new AtomicLong(0)
  private val lastReportAtMillis = new AtomicLong(System.currentTimeMillis())
  private val startedAt = System.currentTimeMillis()

  spark.sparkContext.addSparkListener(this)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      val recs = records.addAndGet(m.inputMetrics.recordsRead)
      bytes.addAndGet(m.inputMetrics.bytesRead)
      val now = System.currentTimeMillis()
      val dueByCount = recs - lastReportAtRecords.get() >= everyRecords
      val dueByTime = now - lastReportAtMillis.get() >= everyMillis
      if ((dueByCount || dueByTime) && recs > 0) {
        lastReportAtRecords.set(recs)
        lastReportAtMillis.set(now)
        val elapsed = math.max(1L, now - startedAt)
        onProgress(ProgressReporter.Tick(recs, bytes.get(),
          recs * 1000.0 / elapsed, elapsed))
      }
    }
  }

  def totalRecords: Long = records.get()

  override def close(): Unit = spark.sparkContext.removeSparkListener(this)
}

object ProgressReporter {
  final case class Tick(records: Long, bytes: Long, recordsPerSec: Double, elapsedMs: Long)
}
