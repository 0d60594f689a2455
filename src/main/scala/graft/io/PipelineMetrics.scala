package graft.io

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability without extra passes.
  *
  * A 100 TB pipeline cannot afford a second scan just to count what it
  * filtered; `Dataset.observe` piggybacks named aggregates onto the
  * SAME job that materializes the result (the write / count / collect),
  * collected driver-side via accumulators. These helpers package the
  * counters a training-data ingest job actually wants.
  */
object PipelineMetrics {

  /** Attach named metrics to `df`; read `obs.get` AFTER an action has
    * consumed the returned frame. */
  def observed(df: DataFrame, name: String,
               metrics: Seq[Column]): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric required")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Standard document-corpus counters: rows, empty/null texts, total +
    * average chars, distinct-ish id check (exact count vs approx ids). */
  def docCounters(id: Column, text: Column): Seq[Column] = Seq(
    count(lit(1)).as("n_rows"),
    sum(when(text.isNull || length(trim(text)) === 0, 1L).otherwise(0L))
      .as("n_empty"),
    sum(coalesce(length(text), lit(0))).as("total_chars"),
    avg(length(text)).as("avg_chars"),
    approx_count_distinct(id).as("approx_ids"))

  /** Per-action execution telemetry (rows written, wall time, the
    * query's name) captured via `QueryExecutionListener` — the
    * session-wide complement to per-frame `observe`: nothing to thread
    * through call sites, every action reports. Register each log ONCE
    * (the listener manager keeps duplicates, which would double-record);
    * long-running sessions should `drain()` periodically — entries
    * otherwise accumulate for the listener's lifetime.
    */
  final class ExecutionLog
      extends org.apache.spark.sql.util.QueryExecutionListener {
    final case class Entry(funcName: String, durationNs: Long,
                           outputRows: Option[Long])
    private val buf =
      new java.util.concurrent.ConcurrentLinkedQueue[Entry]()
    def entries: Seq[Entry] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq
    }
    /** Snapshot-and-clear, for periodic shipping to a metrics store. */
    def drain(): Seq[Entry] = {
      val snap = entries
      snap.foreach(_ => buf.poll())
      snap
    }
    override def onSuccess(funcName: String,
                           qe: org.apache.spark.sql.execution.QueryExecution,
                           durationNs: Long): Unit = {
      val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
      buf.add(Entry(funcName, durationNs, rows))
    }
    override def onFailure(funcName: String,
                           qe: org.apache.spark.sql.execution.QueryExecution,
                           exception: Exception): Unit = ()
  }

  /** Attach a fresh [[ExecutionLog]] to the session and return it. */
  def attachExecutionLog(
      spark: org.apache.spark.sql.SparkSession): ExecutionLog = {
    val log = new ExecutionLog
    spark.listenerManager.register(log)
    log
  }
}
