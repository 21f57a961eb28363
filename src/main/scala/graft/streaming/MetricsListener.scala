package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Engine-side metrics sink (SURVEY.md §2.2 K4): the reference logs a
  * per-prediction latency CSV from inside the operator
  * (/root/reference/src/prediction_producer.py:229-238); the Spark-native
  * equivalent observes micro-batch progress out-of-band — input rows,
  * processed rows/s, batch duration — without touching the data path.
  * Attach with `spark.streams.addListener(listener)`.
  */
final class MetricsListener extends StreamingQueryListener {

  final case class BatchMetric(
      queryName: String, batchId: Long, numInputRows: Long,
      processedRowsPerSecond: Double, batchDurationMs: Long)

  private val metrics = mutable.ArrayBuffer.empty[BatchMetric]

  def snapshot: Seq[BatchMetric] = metrics.synchronized(metrics.toVector)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    metrics.synchronized {
      metrics += BatchMetric(
        Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
        p.processedRowsPerSecond, p.batchDuration)
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}
