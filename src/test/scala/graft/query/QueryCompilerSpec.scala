package graft.query

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.model._
import graft.model.ColumnOperation._

class QueryCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", 10.0, "x"),
    (2L, "b", 20.0, "x"),
    (3L, "a", 30.0, "y"),
    (4L, "c", 40.0, "y"),
    (5L, "a", 50.0, "z")
  ).toDF("id", "cat", "v", "seg")

  test("filters AND-compose and type their literals") {
    val out = QueryCompiler.compile(df,
      StructuredQuery(QueryIntent.Filter,
        columns = Seq("id"),
        operations = Seq(
          Filter("v", CompareOp.Gt, "15"),
          Filter("cat", CompareOp.Ne, "c"))))
    assert(out.as[Long].collect().sorted === Array(2L, 3L, 5L))
    assert(out.columns === Array("id"))
  }

  test("filter(p) and filter(not p) partition the table") {
    val p = StructuredQuery(QueryIntent.Filter,
      operations = Seq(Filter("v", CompareOp.Ge, "30")))
    val notP = StructuredQuery(QueryIntent.Filter,
      operations = Seq(Filter("v", CompareOp.Lt, "30")))
    val n1 = QueryCompiler.compile(df, p).count()
    val n2 = QueryCompiler.compile(df, notP).count()
    assert(n1 + n2 === df.count())
  }

  test("scalar aggregates share one agg with reference aliases") {
    val out = QueryCompiler.compile(df,
      StructuredQuery(QueryIntent.Aggregate,
        operations = Seq(Mean("v"), Sum("v"), Count("id"))))
    assert(out.columns === Array("mean_v", "sum_v", "count_id"))
    val r = out.collect().head
    assert(r.getDouble(0) === 30.0)
    assert(r.getDouble(1) === 150.0)
    assert(r.getLong(2) === 5L)
  }

  test("group-by with no explicit agg counts the key (reference A4)") {
    val out = QueryCompiler.compile(df,
      StructuredQuery(QueryIntent.Aggregate, operations = Seq(GroupBy("cat"))))
    val m = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("grouped aggregate combines GroupBy with agg ops") {
    val out = QueryCompiler.compile(df,
      StructuredQuery(QueryIntent.Aggregate,
        operations = Seq(GroupBy("seg"), Sum("v"))))
    val m = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m === Map("x" -> 30.0, "y" -> 70.0, "z" -> 50.0))
  }

  test("sort orders rows; describe limits to 10; visualize to 100") {
    val sorted = QueryCompiler.compile(df,
      StructuredQuery(QueryIntent.Sort,
        columns = Seq("id"),
        operations = Seq(SortBy("v", ascending = false))))
    assert(sorted.as[Long].collect() === Array(5L, 4L, 3L, 2L, 1L))

    val big = spark.range(200).toDF("id")
    assert(QueryCompiler.compile(big,
      StructuredQuery(QueryIntent.Describe,
        operations = Seq(SortBy("id", ascending = true)))).count() === 10)
    assert(QueryCompiler.compile(big,
      StructuredQuery(QueryIntent.Visualize,
        operations = Seq(SortBy("id", ascending = true)))).count() === 100)
  }

  test("viz numeric averages skip non-numeric and honor explicit cols") {
    val out = QueryCompiler.vizNumericAverages(df)
    assert(out.columns.toSet === Set("avg_id", "avg_v"))
    val one = QueryCompiler.vizNumericAverages(df, Seq("v")).collect().head
    assert(one.getDouble(0) === 30.0)
  }

  test("viz value counts are ordered desc by count") {
    val out = QueryCompiler.vizValueCounts(df, "cat").collect()
    assert(out.head === Row("a", 3L))
    assert(out.map(_.getString(0)).toSet === Set("a", "b", "c"))
  }

  test("aggregate-intent sorts apply on output columns or fail loudly") {
    import ColumnOperation._
    val sorted = QueryCompiler.compile(df,
      StructuredQuery(QueryIntent.Aggregate,
        operations = Seq(GroupBy("cat"), Sum("v"),
          SortBy("sum_v", ascending = false))))
      .collect().map(_.getString(0))
    assert(sorted === Array("a", "c", "b")) // 90, 40, 20
    val e = intercept[IllegalArgumentException] {
      QueryCompiler.compile(df, StructuredQuery(QueryIntent.Aggregate,
        operations = Seq(GroupBy("cat"), Sum("v"), SortBy("v", true))))
        .collect()
    }
    assert(e.getMessage.contains("not in the aggregate output"))
  }

  test("unknown columns fail fast with the full list and schema") {
    val e = intercept[IllegalArgumentException] {
      QueryCompiler.compile(df, StructuredQuery(QueryIntent.Aggregate,
        operations = Seq(Mean("nope"), Sum("also_nope"))))
    }
    assert(e.getMessage.contains("nope") && e.getMessage.contains("also_nope"))
    assert(e.getMessage.contains("available"))
  }

  test("filter literal comparison is numeric, not lexicographic") {
    // "9" > "10" as strings; as numbers 9 < 10 — typed cast must win.
    val d2 = Seq((9.0), (10.0), (100.0)).toDF("v")
    val out = QueryCompiler.compile(d2,
      StructuredQuery(QueryIntent.Filter,
        operations = Seq(Filter("v", CompareOp.Gt, "9"))))
    assert(out.count() === 2)
  }
}

class NLTranslatorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val schema =
    Seq(("n", 1.0, 2.0)).toDF("name", "price", "quantity").schema

  test("intent keywords map to the reference rule table") {
    import graft.model.QueryIntent._
    assert(NLTranslator.translate("average price", schema).intent === Aggregate)
    assert(NLTranslator.translate("total quantity", schema).intent === Aggregate)
    assert(NLTranslator.translate("how many rows", schema).intent === Aggregate)
    assert(NLTranslator.translate("sort by price", schema).intent === Sort)
    assert(NLTranslator.translate("plot price", schema).intent === Visualize)
    assert(NLTranslator.translate("show me the data", schema).intent === Describe)
  }

  test("columns mentioned in text are resolved (not just the first column)") {
    val q = NLTranslator.translate("what is the mean quantity?", schema)
    assert(q.operations === Seq(ColumnOperation.Mean("quantity")))
  }

  test("numeric fallback when no column is mentioned") {
    val q = NLTranslator.translate("average?", schema)
    assert(q.operations === Seq(ColumnOperation.Mean("price")))
  }

  test("conversation context: a bare follow-up inherits the last column focus") {
    import graft.model.{ConversationContext, DatasetMetadata}
    import java.time.Instant
    val t0 = Instant.parse("2026-08-13T00:00:00Z")
    val meta = DatasetMetadata(Seq("name", "price", "quantity"), 3L,
      Map("name" -> "string", "price" -> "double", "quantity" -> "double"))
    // the schema card round-trips (names + types; DDL is always nullable)
    assert(meta.toStructType.fields.map(f => (f.name, f.dataType)).toSeq
      === schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val ctx = ConversationContext.create("c1", "job1", meta, t0)
      .addTurn("what is the mean quantity?", "2.0", t0.plusSeconds(1))
    // follow-up with no column of its own: quantity, not the price fallback
    val q = NLTranslator.translate("and the total?", ctx)
    assert(q.operations === Seq(ColumnOperation.Sum("quantity")))
    // a follow-up naming its own column ignores history
    val q2 = NLTranslator.translate("and the total price?", ctx)
    assert(q2.operations === Seq(ColumnOperation.Sum("price")))
    // no history: plain schema translation (numeric fallback)
    val fresh = ConversationContext.create("c2", "job1", meta, t0)
    assert(NLTranslator.translate("and the total?", fresh).operations
      === Seq(ColumnOperation.Sum("price")))
    // addTurn is immutable and advances updatedAt
    assert(ctx.history.size === 1 && fresh.history.isEmpty)
    assert(ctx.updatedAt === t0.plusSeconds(1) && ctx.createdAt === t0)
    // hostile column names round-trip (backtick doubles in DDL) and an
    // empty card yields an empty schema, not a parse error
    val weird = DatasetMetadata(Seq("a`b"), 1L, Map("a`b" -> "string"))
    assert(weird.toStructType.fieldNames.toSeq === Seq("a`b"))
    assert(DatasetMetadata(Nil, 0L, Map.empty).toStructType.isEmpty)
    // translation over an empty card is total: aggregate/sort degrade
    // to operation-less queries instead of throwing head-of-empty
    val emptyCtx = ConversationContext.create("c3", "job1",
      DatasetMetadata(Nil, 0L, Map.empty), t0)
    assert(NLTranslator.translate("average?", emptyCtx).operations.isEmpty)
    assert(NLTranslator.translate("sort it", emptyCtx).operations.isEmpty)
  }

  test("'<agg> X by Y' produces a grouped aggregate") {
    import ColumnOperation._
    val q = NLTranslator.translate("average price by name", schema)
    assert(q.operations === Seq(GroupBy("name"), Mean("price")))
    val q2 = NLTranslator.translate("total quantity per name", schema)
    assert(q2.operations === Seq(GroupBy("name"), Sum("quantity")))
    // no group column mentioned after 'by' -> plain scalar aggregate
    val q3 = NLTranslator.translate("average price by the way", schema)
    assert(q3.operations === Seq(Mean("price")))
  }

  test("comparison phrases become typed Filter operations") {
    import graft.model.CompareOp
    import ColumnOperation._
    val q = NLTranslator.translate(
      "average price where quantity greater than 45", schema)
    assert(q.intent === QueryIntent.Aggregate)
    assert(q.operations.contains(Filter("quantity", CompareOp.Gt, "45")))

    val q2 = NLTranslator.translate(
      "show price where price at most 0.05 and quantity at least 3", schema)
    assert(q2.intent === QueryIntent.Filter)
    assert(q2.operations.toSet ===
      Set[ColumnOperation](Filter("price", CompareOp.Le, "0.05"),
        Filter("quantity", CompareOp.Ge, "3")))

    // longest phrase wins; trailing punctuation/quotes stripped
    val q3 = NLTranslator.translate(
      "sort by price where quantity greater than or equal to 7?", schema)
    assert(q3.operations.contains(Filter("quantity", CompareOp.Ge, "7")))
    val q4 = NLTranslator.translate("name equals 'bob'", schema)
    assert(q4.operations.contains(Filter("name", CompareOp.Eq, "bob")))
  }

  test("filter columns after 'by' do not hijack grouping or sort targets") {
    import graft.model.CompareOp
    import ColumnOperation._
    // filter column name deliberately LONGER than the group/sort column
    val sch = Seq(("x", 1.0, 2.0)).toDF("flag", "quantity", "extendedprice").schema
    val q = NLTranslator.translate(
      "sum quantity by flag where extendedprice greater than 100", sch)
    assert(q.operations.contains(GroupBy("flag")))
    assert(q.operations.contains(Sum("quantity")))
    assert(q.operations.contains(Filter("extendedprice", CompareOp.Gt, "100")))

    val q2 = NLTranslator.translate(
      "sort by quantity where extendedprice above 7", sch)
    assert(q2.operations.contains(SortBy("quantity", ascending = true)))

    // whole-word mentions: "id" inside "paid" must not produce a filter
    val sch2 = Seq((1L, "a")).toDF("id", "name").schema
    val q3 = NLTranslator.translate("show name where user paid at least 5", sch2)
    assert(!q3.operations.exists {
      case Filter("id", _, _) => true
      case _ => false
    })

    // word-level containment: "total price above 5" with columns
    // total_price AND price must filter total_price only (the nested
    // 'price' mention is suppressed, not AND-composed)
    val sch3 = Seq((1.0, 2.0)).toDF("total_price", "price").schema
    val q4 = NLTranslator.translate("rows where total price above 5", sch3)
    assert(q4.operations.collect { case f: Filter => f } ===
      Seq(Filter("total_price", CompareOp.Gt, "5")))
  }

  test("NL filter compiles end-to-end through QueryCompiler") {
    val df = Seq(("a", 1.0, 10.0), ("b", 2.0, 50.0), ("c", 3.0, 60.0))
      .toDF("name", "price", "quantity")
    val q = NLTranslator.translate(
      "show name, price where quantity greater than 45", df.schema)
    val out = QueryCompiler.compile(df, q)
    assert(out.columns.toSet === Set("name", "price", "quantity"))
    assert(out.count() === 2L)
  }
}
