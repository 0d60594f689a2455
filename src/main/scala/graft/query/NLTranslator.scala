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
  * resolves columns actually mentioned in the text (whole-word, exact or
  * underscores-spaced form only, ordered by first mention; when two
  * names match at the same position — "price index" matching both
  * `price_index`'s spaced form and bare `price` — the longer wins),
  * falling back to the first numeric column for numeric intents — a
  * deliberate improvement recorded in SURVEY.md §2.10.
  *
  * Pure function of (text, schema): no network, no LLM. The reference's
  * LLM path (`ai.rs:207-336`) is driver-side orchestration, out of the
  * engine core; its response parser is a stub anyway
  * (`query_translator.rs:145-153`).
  */
object NLTranslator {

  def translate(text: String, schema: StructType): StructuredQuery =
    translateWith(text, schema, Seq.empty)

  /** History-aware translation — the reference feeds the conversation
    * history into its translation prompt (`query_translator.rs:109-142`,
    * consumed at `services/conversation.rs:91-112`); the rule-based
    * analog here: a follow-up that names NO column ("and the average?")
    * inherits the column focus of the most recent turn that named one.
    * A query that names its own columns ignores history entirely. */
  def translate(text: String, context: ConversationContext): StructuredQuery = {
    val schema = context.datasetMetadata.toStructType
    // resolve mentions ONCE; translateWith receives them so the
    // inherit-or-not decision and the translation can never disagree
    val own = mentionedColumns(text.toLowerCase, schema)
    val mentioned =
      if (own.nonEmpty) own
      else context.history.reverseIterator
        .map(t => mentionedColumns(t.query.toLowerCase, schema))
        .find(_.nonEmpty).getOrElse(Seq.empty)
    translateWith(text, schema, mentioned)
  }

  private def translateWith(text: String, schema: StructType,
                            resolved: Seq[String]): StructuredQuery = {
    val q = text.toLowerCase
    val mentioned =
      if (resolved.nonEmpty) resolved else mentionedColumns(q, schema)

    def numericCols: Seq[String] =
      schema.fields.filter(f => QueryCompiler.isNumeric(f.dataType)).map(_.name).toSeq
    // Option, not .head: an EMPTY schema card is a legal context
    // (DatasetMetadata(Nil, ...)), and an aggregate/sort over it must
    // degrade to an operation-less query, not throw head-of-empty
    def targetOpt: Option[String] =
      mentioned.headOption
        .orElse(numericCols.headOption)
        .orElse(schema.fields.headOption.map(_.name))

    // "<agg> X by Y" / "<agg> X per Y": group on the column mentioned
    // after by/per, aggregate the other mentioned (or first numeric) one.
    def grouped(mk: String => ColumnOperation): StructuredQuery = {
      val byCol = "(?:\\bby\\b|\\bper\\b)\\s+(.*)".r.findFirstMatchIn(q)
        .flatMap(m => mentionedColumns(m.group(1), schema).headOption)
      byCol match {
        case Some(g) =>
          val measure = mentioned.filterNot(_ == g).headOption
            .orElse(numericCols.filterNot(_ == g).headOption)
            .getOrElse(schema.fields.head.name) // g matched, so nonempty
          StructuredQuery(QueryIntent.Aggregate,
            operations = Seq(GroupBy(g), mk(measure)))
        case None =>
          StructuredQuery(QueryIntent.Aggregate,
            operations = targetOpt.map(mk).toSeq)
      }
    }

    val fs = filterPhrases(q, schema)
    def withFilters(sq: StructuredQuery): StructuredQuery =
      sq.copy(operations = sq.operations ++ fs)

    withFilters(
      if (q.contains("average") || q.contains("mean")) grouped(Mean)
      else if (q.contains("sum") || q.contains("total")) grouped(Sum)
      else if (q.contains("count") || q.contains("how many")) grouped(Count)
      else if (q.contains("group"))
        StructuredQuery(QueryIntent.Aggregate,
          operations = mentioned.headOption.map(GroupBy).toSeq)
      else if (q.contains("sort") || q.contains("order by"))
        StructuredQuery(QueryIntent.Sort,
          operations = targetOpt
            .map(SortBy(_, ascending = !q.contains("desc"))).toSeq)
      else if (q.contains("chart") || q.contains("plot") || q.contains("visuali"))
        StructuredQuery(QueryIntent.Visualize, columns = mentioned)
      else if (fs.nonEmpty && mentioned.nonEmpty)
        StructuredQuery(QueryIntent.Filter, columns = mentioned)
      else
        StructuredQuery(QueryIntent.Describe, columns = mentioned))
  }

  /** Comparison phrases, longest first so "greater than or equal to"
    * wins over "greater than". Deliberately NO bare "is"/"=": too
    * ambiguous in questions ("what is the average ...").
    */
  private val CmpPhrases: Seq[(String, CompareOp)] = Seq(
    "greater than or equal to" -> CompareOp.Ge,
    "less than or equal to" -> CompareOp.Le,
    "not equal to" -> CompareOp.Ne,
    "greater than" -> CompareOp.Gt,
    "less than" -> CompareOp.Lt,
    "more than" -> CompareOp.Gt,
    "at least" -> CompareOp.Ge,
    "at most" -> CompareOp.Le,
    "equal to" -> CompareOp.Eq,
    "equals" -> CompareOp.Eq,
    "above" -> CompareOp.Gt,
    "below" -> CompareOp.Lt,
    "under" -> CompareOp.Lt)

  /** `<column> <comparison phrase> <value>` occurrences anywhere in the
    * text, one typed Filter per match ("where l_quantity greater than 45
    * and l_discount at most 0.05" → two AND-composed predicates —
    * QueryCompiler applies filters before every intent). Column mentions
    * are whole-word ("id" never fires inside "paid"), every occurrence
    * is checked ("show price where price at most 0.05" must match the
    * second mention), and a mention CONTAINED in a longer column's
    * mention is suppressed ("total price above 5" with columns
    * `total_price` and `price` must filter total_price only).
    */
  private def filterPhrases(q: String, schema: StructType): Seq[ColumnOperation] = {
    // (filter, matched span) candidates for every column mention
    val cands = schema.fields.toSeq.flatMap { f =>
      val names = Seq(f.name.toLowerCase, f.name.toLowerCase.replace('_', ' '))
        .distinct
      names.flatMap { n =>
        val re = ("(?<![a-z0-9_])" + java.util.regex.Pattern.quote(n) +
          "(?![a-z0-9_])").r
        re.findAllMatchIn(q).flatMap { m =>
          val rest = q.substring(m.end).trim
          CmpPhrases.collectFirst {
            case (p, op) if rest.startsWith(p + " ") =>
              val raw = rest.stripPrefix(p).trim
                .split("\\s+").headOption.getOrElse("")
              val v = raw.replaceAll("[?.,;!]+$", "")
                .replaceAll("^['\"]|['\"]$", "")
              (Filter(f.name, op, v), m.start, m.end)
          }.filter(_._1.value.nonEmpty)
        }
      }
    }
    cands.filterNot { case (flt, s, e) =>
      cands.exists { case (other, os, oe) =>
        other.column != flt.column && os <= s && e <= oe && (oe - os) > (e - s)
      }
    }.map(_._1).distinct
  }

  /** Position of the first whole-word mention of `name` (or its
    * spaced variant) in the text; -1 if absent. Word-bounded so "id"
    * never matches inside "paid". */
  private def mentionIndex(q: String, name: String): Int = {
    val forms = Seq(name.toLowerCase, name.toLowerCase.replace('_', ' ')).distinct
    val hits = forms.flatMap { f =>
      ("(?<![a-z0-9_])" + java.util.regex.Pattern.quote(f) + "(?![a-z0-9_])").r
        .findFirstMatchIn(q).map(_.start)
    }
    if (hits.isEmpty) -1 else hits.min
  }

  /** Columns mentioned (whole-word) in the text, ordered by POSITION of
    * first mention — "sort by price where quantity > 7" must resolve
    * price, not whichever name is longest — with longer names winning
    * only at the same position (overlapping mentions).
    */
  private def mentionedColumns(q: String, schema: StructType): Seq[String] =
    schema.fields.map(_.name)
      .map(n => (n, mentionIndex(q, n)))
      .filter(_._2 >= 0)
      .sortBy { case (n, i) => (i, -n.length) }
      .map(_._1).toSeq
}
