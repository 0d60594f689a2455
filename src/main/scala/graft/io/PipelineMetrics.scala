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
}
