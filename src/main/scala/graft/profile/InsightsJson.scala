package graft.profile

import graft.profile.Profiler.{ColumnStats, Insights}

/** Serializes [[Profiler.Insights]] to the reference's response JSON
  * shape (`/root/reference/src/models/response.rs:23-80`): snake_case
  * field names, statistics rendered as `"%.2f"` STRINGS (the reference
  * formats at compute time, `processor.rs:353-355`; we keep the engine
  * numeric and format only here at the serialization edge — SURVEY.md §7
  * "formatting" decision), `frequent_values` as a value→count map.
  *
  * Hand-rolled emitter: the engine adds no JSON dependency, and the
  * output is driver-sized (one object per column, not per row).
  */
object InsightsJson {

  private def esc(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def numStr(v: Option[Double]): String =
    v.filterNot(d => d.isNaN || d.isInfinite)
      .map(d => esc(f"$d%.2f")).getOrElse("null")

  private def arr(vs: Seq[String]): String = vs.map(esc).mkString("[", ",", "]")

  private def colJson(c: ColumnStats): String = {
    val freq = c.frequentValues match {
      case Some(fv) =>
        fv.map { case (v, n) => s"${esc(v)}:$n" }.mkString("{", ",", "}")
      case None => "null"
    }
    s"""{"name":${esc(c.name)},"data_type":${esc(c.dataType)},""" +
      s""""null_count":${c.nullCount},"unique_count":${c.uniqueCount},""" +
      s""""min":${numStr(c.min)},"max":${numStr(c.max)},"mean":${numStr(c.mean)},""" +
      s""""median":${numStr(c.median)},"std_dev":${numStr(c.stdDev)},""" +
      s""""percentile_25":${numStr(c.percentile25)},""" +
      s""""percentile_75":${numStr(c.percentile75)},""" +
      s""""frequent_values":$freq}"""
  }

  /** `AISummary` in the reference's snake_case response shape
    * (`response.rs:50-71`). */
  def aiJson(a: graft.model.AISummary): String = {
    val recs = a.actionableRecommendations.map(r =>
      s"""{"recommendation":${esc(r.recommendation)},""" +
        s""""rationale":${esc(r.rationale)}}""").mkString("[", ",", "]")
    val vizzes = a.visualizationRecommendations.map(v =>
      s"""{"chart_type":${esc(v.chartType)},"title":${esc(v.title)},""" +
        s""""description":${esc(v.description)},""" +
        s""""columns":${arr(v.columns)}}""").mkString("[", ",", "]")
    s"""{"summary":${esc(a.summary)},""" +
      s""""key_insights":${arr(a.keyInsights)},""" +
      s""""actionable_recommendations":$recs,""" +
      s""""visualization_recommendations":$vizzes}"""
  }

  /** Full Insights document (reference `Insights`, `response.rs:74-80`).
    * `ai_analysis` is null when absent, for shape parity: the field
    * exists in the reference response, but filling it is an LLM call —
    * a driver-side concern the engine deliberately excludes. A driver
    * that ran one passes the result (typically through
    * [[graft.model.AISummary.validated]]) and gets the reference's
    * serialized shape back. */
  def render(ins: Insights,
             aiAnalysis: Option[graft.model.AISummary] = None): String = {
    val ds = ins.dataSummary
    val summary =
      s"""{"row_count":${ds.rowCount},"column_count":${ds.columnCount},""" +
        s""""numeric_columns":${arr(ds.numericColumns)},""" +
        s""""categorical_columns":${arr(ds.categoricalColumns)},""" +
        s""""date_columns":${arr(ds.dateColumns)},""" +
        s""""summary_text":${esc(ds.summaryText)}}"""
    val cols = ins.columnStatistics.map(colJson).mkString("[", ",", "]")
    val corr = ins.correlations.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${esc(k)}:${esc(f"$v%.4f")}" }.mkString("{", ",", "}")
    val ai = aiAnalysis.map(aiJson).getOrElse("null")
    s"""{"data_summary":$summary,"column_statistics":$cols,""" +
      s""""correlations":$corr,"ai_analysis":$ai}"""
  }
}
