package graft.query

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model._
import graft.model.ColumnOperation._

/** JSON ↔ StructuredQuery codec — the properly-implemented version of
  * the reference's LLM-response parser, which is a stub that discards
  * the model output and returns a hard-coded Describe
  * (`/root/reference/src/services/query_translator.rs:145-153`).
  *
  * Accepts the shape the reference's own LLM prompt requests
  * (`query_translator.rs:109-142`):
  * `{"intent": "...", "columns": [...], "operations":
  *   [{"type": "mean|sum|count|group_by|sort_by|filter",
  *     "column": "...", "ascending": true, "operator": ">", "value": "..."}]}`
  *
  * Jackson comes from Spark's own classpath — no new dependency.
  * Malformed documents return Left with a reason (never a silent
  * fallback query).
  */
object QueryJson {

  private val mapper = new ObjectMapper()

  def parse(json: String): Either[String, StructuredQuery] =
    for {
      root <- Try(mapper.readTree(json)).toEither.left.map(e =>
        s"invalid JSON: ${e.getMessage}")
      _ <- Either.cond(root != null && root.isObject, (), "expected a JSON object")
      intent <- parseIntent(Option(root.get("intent")).map(_.asText("")).getOrElse(""))
      ops <- parseOps(root.get("operations"))
    } yield {
      val cols = Option(root.get("columns")).filter(_.isArray)
        .map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(Seq.empty)
      StructuredQuery(intent, cols, ops)
    }

  private def parseIntent(s: String): Either[String, QueryIntent] =
    s.toLowerCase match {
      case "aggregate" => Right(QueryIntent.Aggregate)
      case "filter"    => Right(QueryIntent.Filter)
      case "sort"      => Right(QueryIntent.Sort)
      case "describe"  => Right(QueryIntent.Describe)
      case "visualize" => Right(QueryIntent.Visualize)
      case other       => Left(s"unknown intent '$other'")
    }

  private def parseOps(node: JsonNode): Either[String, Seq[ColumnOperation]] = {
    if (node == null || !node.isArray) Right(Seq.empty)
    else {
      val results = node.elements().asScala.map(parseOp).toSeq
      results.collectFirst { case Left(e) => e } match {
        case Some(err) => Left(err)
        case None      => Right(results.collect { case Right(op) => op })
      }
    }
  }

  private def parseOp(n: JsonNode): Either[String, ColumnOperation] = {
    def col = Option(n.get("column")).map(_.asText(""))
      .filter(_.nonEmpty).toRight("operation missing 'column'")
    Option(n.get("type")).map(_.asText("")).getOrElse("").toLowerCase match {
      case "mean" | "avg" | "average" => col.map(Mean)
      case "sum"                      => col.map(Sum)
      case "count"                    => col.map(Count)
      case "group_by" | "groupby"     => col.map(GroupBy)
      case "sort_by" | "sortby" =>
        col.map(SortBy(_,
          ascending = Option(n.get("ascending")).forall(_.asBoolean(true))))
      case "filter" =>
        for {
          c <- col
          opSym <- Option(n.get("operator")).map(_.asText(""))
            .filter(_.nonEmpty).toRight("filter missing 'operator'")
          op <- CompareOp.parse(opSym).toRight(s"unknown operator '$opSym'")
          v <- Option(n.get("value")).map(_.asText())
            .toRight("filter missing 'value'")
        } yield Filter(c, op, v)
      case other => Left(s"unknown operation type '$other'")
    }
  }

  /** Render a StructuredQuery back to the same JSON shape (prompt
    * few-shot construction, logging, round-trip tests). */
  def render(q: StructuredQuery): String = {
    val intent = q.intent match {
      case QueryIntent.Aggregate => "aggregate"
      case QueryIntent.Filter => "filter"
      case QueryIntent.Sort => "sort"
      case QueryIntent.Describe => "describe"
      case QueryIntent.Visualize => "visualize"
    }
    val root = mapper.createObjectNode()
    root.put("intent", intent)
    val colArr = root.putArray("columns")
    q.columns.foreach(colArr.add)
    val opsArr = root.putArray("operations")
    q.operations.foreach { op =>
      val o = opsArr.addObject()
      op match {
        case Mean(c) => o.put("type", "mean").put("column", c)
        case Sum(c) => o.put("type", "sum").put("column", c)
        case Count(c) => o.put("type", "count").put("column", c)
        case GroupBy(c) => o.put("type", "group_by").put("column", c)
        case SortBy(c, asc) =>
          o.put("type", "sort_by").put("column", c).put("ascending", asc)
        case Filter(c, cmp, v) =>
          o.put("type", "filter").put("column", c)
            .put("operator", cmp.symbols.head).put("value", v)
      }
    }
    mapper.writeValueAsString(root)
  }
}
