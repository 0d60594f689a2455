package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.model.ColumnOperation._

/** Pure JVM spec — no Spark session needed. */
class QueryJsonSpec extends AnyFunSuite {

  test("parses the reference prompt's JSON shape") {
    val json =
      """{"intent": "aggregate", "columns": ["price"],
        | "operations": [
        |   {"type": "group_by", "column": "segment"},
        |   {"type": "mean", "column": "price"},
        |   {"type": "filter", "column": "qty", "operator": ">", "value": "10"}]}"""
        .stripMargin
    val q = QueryJson.parse(json).toOption.get
    assert(q.intent === QueryIntent.Aggregate)
    assert(q.columns === Seq("price"))
    assert(q.operations === Seq(
      GroupBy("segment"), Mean("price"), Filter("qty", CompareOp.Gt, "10")))
  }

  test("sort_by honors ascending; defaults true when absent") {
    val q = QueryJson.parse(
      """{"intent":"sort","operations":[
        |{"type":"sort_by","column":"v","ascending":false},
        |{"type":"sort_by","column":"w"}]}""".stripMargin).toOption.get
    assert(q.operations === Seq(SortBy("v", ascending = false),
      SortBy("w", ascending = true)))
  }

  test("malformed documents return explicit errors, never a fallback") {
    assert(QueryJson.parse("not json").isLeft)
    assert(QueryJson.parse("""{"intent":"conquer"}""").swap.toOption.get
      .contains("unknown intent"))
    assert(QueryJson.parse(
      """{"intent":"filter","operations":[{"type":"filter","column":"c"}]}""")
      .swap.toOption.get.contains("missing 'operator'"))
    assert(QueryJson.parse(
      """{"intent":"filter","operations":[{"type":"levitate","column":"c"}]}""")
      .swap.toOption.get.contains("unknown operation type"))
  }

  test("render/parse round-trips every operation type") {
    val q = StructuredQuery(QueryIntent.Visualize, Seq("a", "b"), Seq(
      Mean("a"), Sum("b"), Count("a"), GroupBy("b"),
      SortBy("a", ascending = false), Filter("b", CompareOp.Le, "3.5")))
    assert(QueryJson.parse(QueryJson.render(q)) === Right(q))
  }
}
