package graft.model

/** The reference's AI-analysis response model
  * (`/root/reference/src/models/response.rs:50-71`): the typed shape an
  * LLM summarization step fills in, carried alongside the engine's
  * computed `Insights`. The LLM CALL is driver-side by design
  * (SURVEY.md §2.10) — the engine owns the data model so a caller
  * porting the reference keeps the exact response schema, including the
  * hard-coded fallback used when generation fails or returns nothing
  * (`/root/reference/src/services/processor.rs:172-207`).
  */
final case class ActionableRecommendation(
    recommendation: String,
    rationale: String)

final case class VisualizationRecommendation(
    chartType: String,
    title: String,
    description: String,
    columns: Seq[String])

final case class AISummary(
    summary: String,
    keyInsights: Seq[String],
    actionableRecommendations: Seq[ActionableRecommendation],
    visualizationRecommendations: Seq[VisualizationRecommendation]) {

  /** The reference's emptiness test (`processor.rs:177-181`): blank
    * summary AND no content in any list. */
  def isEmpty: Boolean =
    summary.trim.isEmpty && keyInsights.isEmpty &&
      actionableRecommendations.isEmpty && visualizationRecommendations.isEmpty
}

object AISummary {

  /** The reference's fallback document, verbatim (`processor.rs:183-195`,
    * repeated at `:197-206`): what the response carries when the LLM
    * produced nothing usable. `lastError` defaults to "Unknown" exactly
    * as the reference's `unwrap_or_else` does. */
  def fallback(lastError: Option[String] = None): AISummary = AISummary(
    summary = "AI analysis could not be generated at this time. " +
      s"Last error: ${lastError.getOrElse("Unknown")}",
    keyInsights = Seq("No insights could be generated from the data."),
    actionableRecommendations = Seq(ActionableRecommendation(
      recommendation = "Review your dataset for completeness and try again.",
      rationale = "The AI was unable to extract meaningful patterns or " +
        "recommendations from the current data.")),
    visualizationRecommendations = Seq.empty)

  /** The reference's validation policy (`processor.rs:176-207`): a
    * present-but-empty summary and an outright failure both resolve to
    * [[fallback]]; anything with content passes through. */
  def validated(result: Option[AISummary],
                lastError: Option[String] = None): AISummary =
    result match {
      case Some(s) if !s.isEmpty => s
      case _                     => fallback(lastError)
    }
}
