package graft.query

import org.apache.spark.sql.types.StructType

import graft.model._
import graft.model.ColumnOperation._

/** Rule-based natural-language → StructuredQuery translator.
  *
  * The reference's rule path (`/root/reference/src/services/
  * query_translator.rs:156-213`) keyword-matches the intent and always
  * targets the FIRST column of the schema regardless of the question.
  * This version keeps the same deterministic keyword → intent rules but
  * resolves columns actually mentioned in the text (longest-name-first so
  * "total price" prefers `o_totalprice` over `price`), falling back to
  * the first numeric column for numeric intents — a deliberate
  * improvement recorded in SURVEY.md §2.10.
  *
  * Pure function of (text, schema): no network, no LLM. The reference's
  * LLM path (`ai.rs:207-336`) is driver-side orchestration, out of the
  * engine core; its response parser is a stub anyway
  * (`query_translator.rs:145-153`).
  */
object NLTranslator {

  def translate(text: String, schema: StructType): StructuredQuery = {
    val q = text.toLowerCase
    val mentioned = mentionedColumns(q, schema)

    def numericCols: Seq[String] =
      schema.fields.filter(f => QueryCompiler.isNumeric(f.dataType)).map(_.name).toSeq
    def target: String =
      mentioned.headOption
        .orElse(numericCols.headOption)
        .getOrElse(schema.fields.head.name)

    // "<agg> X by Y" / "<agg> X per Y": group on the column mentioned
    // after by/per, aggregate the other mentioned (or first numeric) one.
    def grouped(mk: String => ColumnOperation): StructuredQuery = {
      val byCol = "(?:\\bby\\b|\\bper\\b)\\s+(.*)".r.findFirstMatchIn(q)
        .flatMap(m => mentionedColumns(m.group(1), schema).headOption)
      byCol match {
        case Some(g) =>
          val measure = mentioned.filterNot(_ == g).headOption
            .orElse(numericCols.filterNot(_ == g).headOption)
            .getOrElse(schema.fields.head.name)
          StructuredQuery(QueryIntent.Aggregate,
            operations = Seq(GroupBy(g), mk(measure)))
        case None =>
          StructuredQuery(QueryIntent.Aggregate, operations = Seq(mk(target)))
      }
    }

    if (q.contains("average") || q.contains("mean")) grouped(Mean)
    else if (q.contains("sum") || q.contains("total")) grouped(Sum)
    else if (q.contains("count") || q.contains("how many")) grouped(Count)
    else if (q.contains("group"))
      StructuredQuery(QueryIntent.Aggregate,
        operations = mentioned.headOption.map(GroupBy).toSeq)
    else if (q.contains("sort") || q.contains("order by"))
      StructuredQuery(QueryIntent.Sort,
        operations = Seq(SortBy(target, ascending = !q.contains("desc"))))
    else if (q.contains("chart") || q.contains("plot") || q.contains("visuali"))
      StructuredQuery(QueryIntent.Visualize, columns = mentioned)
    else
      StructuredQuery(QueryIntent.Describe, columns = mentioned)
  }

  /** Columns whose name (or name with separators spaced) occurs in the
    * text, longest first so specific names win over substrings.
    */
  private def mentionedColumns(q: String, schema: StructType): Seq[String] =
    schema.fields.map(_.name)
      .filter { n =>
        val ln = n.toLowerCase
        q.contains(ln) || q.contains(ln.replace('_', ' '))
      }
      .sortBy(-_.length).toSeq
}
