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

  /** Chart.js-style visualization payload for a query result — the
    * reference's post-query chart assembly
    * (`/root/reference/src/services/conversation.rs:188-286`):
    * numeric columns → bar chart of their averages; otherwise the first
    * string column → bar chart of its value counts; otherwise a table
    * config. Output shape matches the reference exactly:
    * `{"type":"bar","data":{"labels":[...],"datasets":[{"label":...,
    * "data":[...]}]},"options":{}}`.
    *
    * Where the reference iterates its ≤100-row JSON sample driver-side,
    * the aggregates here are the DISTRIBUTED A13/A14 ops
    * ([[QueryCompiler.vizNumericAverages]] / [[QueryCompiler.vizValueCounts]])
    * over the full table — only the chart-sized result is collected.
    * The chooser reads the schema, not sampled values (a numeric column
    * is numeric by type; the reference's parse-a-string-cell heuristic
    * exists because its pipeline is stringly typed). Value counts keep
    * the top `maxLabels` bars (count desc, label asc — deterministic,
    * unlike the reference's map-iteration order); the table fallback
    * keeps `maxLabels` rows, mirroring the reference's 100-row viz cap.
    */
  def vizPayload(df: org.apache.spark.sql.DataFrame,
                 maxLabels: Int = 100): String = {
    import org.apache.spark.sql.types.StringType
    val root = mapper.createObjectNode()
    val numeric = df.schema.fields
      .collect { case f if QueryCompiler.isNumeric(f.dataType) => f.name }
    val strings = df.schema.fields
      .collect { case f if f.dataType == StringType => f.name }
    if (numeric.nonEmpty) {
      val row = QueryCompiler.vizNumericAverages(df, numeric.toSeq).head()
      root.put("type", "bar")
      val data = root.putObject("data")
      val labels = data.putArray("labels")
      numeric.foreach(labels.add)
      val ds = data.putArray("datasets").addObject()
      ds.put("label", "Average")
      val vals = ds.putArray("data")
      numeric.indices.foreach { i =>
        // a column of all-null cells averages to SQL NULL; the reference
        // emits 0.0 there (count == 0 branch, conversation.rs:216-220)
        if (row.isNullAt(i)) vals.add(0.0) else vals.add(row.getDouble(i))
      }
      root.putObject("options")
    } else if (strings.nonEmpty) {
      val c = strings.head
      val counts = QueryCompiler.vizValueCounts(df, c).limit(maxLabels).collect()
      root.put("type", "bar")
      val data = root.putObject("data")
      val labels = data.putArray("labels")
      val ds = data.putArray("datasets").addObject()
      ds.put("label", s"$c count")
      val vals = mapper.createArrayNode()
      counts.foreach { r =>
        labels.add(if (r.isNullAt(0)) null else r.getString(0))
        vals.add(r.getLong(1))
      }
      ds.set[JsonNode]("data", vals)
      root.putObject("options")
    } else {
      // no chartable columns: table config (conversation.rs:271-286).
      // Cells serialize as typed JSON VALUES (the reference's serde
      // to_string() rendering: null -> null, arrays -> [1.0], numbers
      // bare) — String.valueOf would emit "null" and Scala's
      // WrappedArray(...) toString instead.
      root.put("type", "table")
      val data = root.putObject("data")
      val cols = data.putArray("columns")
      df.columns.foreach(cols.add)
      val rows = data.putArray("rows")
      df.limit(maxLabels).collect().foreach { r =>
        val arr = rows.addArray()
        df.columns.indices.foreach(i => arr.add(cellNode(r.get(i))))
      }
      root.putObject("options")
    }
    mapper.writeValueAsString(root)
  }

  /** One table cell as a typed JSON node (see the table branch above).
    * Temporal and other scalar types render via toString — their SQL
    * text form, quoted, matching the reference's string rendering. */
  private def cellNode(v: Any): JsonNode = v match {
    case null => mapper.nullNode()
    case s: String => mapper.getNodeFactory.textNode(s)
    case i: java.lang.Integer => mapper.getNodeFactory.numberNode(i.intValue())
    case l: java.lang.Long => mapper.getNodeFactory.numberNode(l.longValue())
    case d: java.lang.Double => mapper.getNodeFactory.numberNode(d.doubleValue())
    case f: java.lang.Float => mapper.getNodeFactory.numberNode(f.floatValue())
    case s: java.lang.Short => mapper.getNodeFactory.numberNode(s.shortValue())
    case b: java.lang.Byte => mapper.getNodeFactory.numberNode(b.byteValue())
    case b: java.lang.Boolean => mapper.getNodeFactory.booleanNode(b.booleanValue())
    case bd: java.math.BigDecimal => mapper.getNodeFactory.numberNode(bd)
    case bd: scala.math.BigDecimal => mapper.getNodeFactory.numberNode(bd.bigDecimal)
    case seq: scala.collection.Seq[_] =>
      val a = mapper.createArrayNode(); seq.foreach(x => a.add(cellNode(x))); a
    case arr: Array[_] =>
      val a = mapper.createArrayNode(); arr.foreach(x => a.add(cellNode(x))); a
    case m: scala.collection.Map[_, _] =>
      val o = mapper.createObjectNode()
      m.foreach { case (k, x) => o.set[JsonNode](String.valueOf(k), cellNode(x)) }
      o
    case r: org.apache.spark.sql.Row =>
      val a = mapper.createArrayNode()
      (0 until r.length).foreach(i => a.add(cellNode(r.get(i))))
      a
    case other => mapper.getNodeFactory.textNode(other.toString)
  }
}
