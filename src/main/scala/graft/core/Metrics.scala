package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine observability — the Spark-native replacement for the
  * reference's optional Elastic APM instrumentation
  * (`migrator.go:206-224`, `migrator.go:482-497` in /root/reference):
  * a `QueryExecutionListener` records per-action wall time and failures;
  * `summary()` is the per-batch logline material
  * (`extractor_sequential.go:90`, `loader_default.go:61` parity).
  */
object Metrics {

  final case class ActionMetric(action: String, durationNs: Long,
                                error: Option[String])

  private val buf = new ConcurrentLinkedQueue[ActionMetric]()
  private val attachedFlag = "graft.metrics.attached"

  /** Ring-buffer bound — a continuously-running drain executes several
    * actions per micro-batch; unbounded accumulation would leak driver
    * heap for the lifetime of the process.
    */
  val MaxEntries = 10000

  /** Tracked alongside the queue because `ConcurrentLinkedQueue.size()`
    * is O(n) — calling it per recorded action would cost a ~10k-node
    * traversal on every Spark action once the buffer fills, in exactly
    * the small-batch drain loops the listener is meant to observe.
    */
  private val size = new java.util.concurrent.atomic.AtomicInteger(0)

  private def add(m: ActionMetric): Unit = {
    buf.add(m)
    var n = size.incrementAndGet()
    while (n > MaxEntries) {
      n = if (buf.poll() != null) size.decrementAndGet()
          else size.get() // racing clear() emptied it first
      if (n <= MaxEntries || buf.isEmpty) return
    }
  }

  /** Idempotent per-session attach (guarded by a session conf flag so
    * repeated `GraftSession.configure` calls don't stack listeners).
    */
  def attach(spark: SparkSession): Unit =
    if (!spark.conf.getOption(attachedFlag).contains("true")) {
      spark.conf.set(attachedFlag, "true")
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit =
          add(ActionMetric(funcName, durationNs, None))
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit =
          add(ActionMetric(funcName, 0L, Some(exception.toString)))
      })
    }

  def snapshot(): Seq[ActionMetric] = buf.iterator().asScala.toSeq

  def clear(): Unit = { buf.clear(); size.set(0) }

  /** (actions, failures, total wall seconds) since the last clear. */
  def summary(): (Int, Int, Double) = {
    val s = snapshot()
    (s.size, s.count(_.error.isDefined), s.map(_.durationNs).sum / 1e9)
  }
}
