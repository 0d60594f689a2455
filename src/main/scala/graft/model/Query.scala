package graft.model

/** Query IR — the engine's structured-query surface.
  *
  * Mirrors the capabilities of the reference IR
  * (`/root/reference/src/services/query_translator.rs:14-53`:
  * `QueryIntent`, `ColumnOperation`, `StructuredQuery`) as Scala ADTs.
  * Semantics differences are deliberate (SURVEY.md §2.2): filter literals
  * are typed against the column's dtype instead of the reference's
  * string/f64 asymmetry, and unparseable literals surface as errors
  * (ANSI cast) instead of being silently dropped
  * (`query_translator.rs:365-404`).
  */
sealed trait QueryIntent
object QueryIntent {
  case object Aggregate extends QueryIntent
  case object Filter extends QueryIntent
  case object Sort extends QueryIntent
  case object Describe extends QueryIntent
  case object Visualize extends QueryIntent
}

/** Comparison operators accepted by the reference filter arm
  * (`query_translator.rs:359-415`): `=`,`==`,`>`,`<`,`>=`,`<=`,`!=`,`<>`.
  */
sealed abstract class CompareOp(val symbols: Set[String])
object CompareOp {
  case object Eq extends CompareOp(Set("=", "=="))
  case object Ne extends CompareOp(Set("!=", "<>"))
  case object Gt extends CompareOp(Set(">"))
  case object Lt extends CompareOp(Set("<"))
  case object Ge extends CompareOp(Set(">="))
  case object Le extends CompareOp(Set("<="))

  val all: Seq[CompareOp] = Seq(Eq, Ne, Gt, Lt, Ge, Le)
  def parse(sym: String): Option[CompareOp] = all.find(_.symbols(sym))
}

/** One operation inside a StructuredQuery
  * (`query_translator.rs:29-42`). */
sealed trait ColumnOperation
object ColumnOperation {
  final case class Mean(column: String) extends ColumnOperation
  final case class Sum(column: String) extends ColumnOperation
  final case class Count(column: String) extends ColumnOperation
  final case class GroupBy(column: String) extends ColumnOperation
  final case class SortBy(column: String, ascending: Boolean) extends ColumnOperation
  final case class Filter(column: String, op: CompareOp, value: String) extends ColumnOperation
}

/** A complete structured query (`query_translator.rs:46-53`).
  *
  * `columns` is the projection (empty = all); `operations` compose into a
  * single logical plan: filters AND-chain, aggregations share one `agg`,
  * sorts apply in sequence.
  */
final case class StructuredQuery(
    intent: QueryIntent,
    columns: Seq[String] = Seq.empty,
    operations: Seq[ColumnOperation] = Seq.empty)
