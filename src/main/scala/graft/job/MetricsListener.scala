package graft.job

import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Per-micro-batch throughput metrics — the analog of the reference's
  * Prometheus endpoint (`internal/worker.go:93-108`), emitted as JSON
  * lines per micro-batch and retained for BENCH artifacts.
  */
class MetricsListener(verbose: Boolean = false) extends StreamingQueryListener {
  final case class BatchMetric(
      batchId: Long, inputRows: Long, durationMs: Long, rowsPerSec: Double)

  val metrics = new ConcurrentLinkedQueue[BatchMetric]()

  // cumulative counters for the ops endpoint (drain() empties the queue,
  // so scrapes can't ride on it)
  val totalBatches = new java.util.concurrent.atomic.AtomicLong(0L)
  val totalRows = new java.util.concurrent.atomic.AtomicLong(0L)
  val lastBatchId = new java.util.concurrent.atomic.AtomicLong(-1L)

  /** Prometheus text rendering ≙ the reference's promhttp route
    * (`internal/worker.go:106-108`).
    */
  def prometheusText: String =
    s"""# TYPE graft_micro_batches_total counter
       |graft_micro_batches_total ${totalBatches.get}
       |# TYPE graft_input_rows_total counter
       |graft_input_rows_total ${totalRows.get}
       |# TYPE graft_last_batch_id gauge
       |graft_last_batch_id ${lastBatchId.get}
       |""".stripMargin

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val dur = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)
    if (p.numInputRows > 0 || dur > 0) {
      val m = BatchMetric(p.batchId, p.numInputRows, dur,
        if (dur > 0) p.numInputRows * 1000.0 / dur else 0.0)
      totalBatches.incrementAndGet()
      totalRows.addAndGet(p.numInputRows)
      lastBatchId.set(p.batchId)
      metrics.add(m)
      if (verbose)
        System.err.println(
          s"""{"metric":"micro_batch","batchId":${m.batchId},""" +
          s""""inputRows":${m.inputRows},"durationMs":${m.durationMs},""" +
          s""""rowsPerSec":${"%.1f".format(m.rowsPerSec)}}""")
    }
  }

  def drain(): Seq[BatchMetric] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[BatchMetric]
    var m = metrics.poll()
    while (m != null) { out += m; m = metrics.poll() }
    out.toSeq
  }
}
