package graft

import java.nio.file.Files

import graft.io.{Sinks, Tables}
import graft.profile.Profiler

/** API-surface specs: SQL extension functions, JSON sinks, Insights
  * serialization, CSV ingestion. */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions callable from SQL after install") {
    GraftExtensions.install(spark)
    Seq((1L, Array(1.0, 2.0, 3.0))).toDF("id", "v").createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT vec_dot(v, v) AS d, vec_sqnorm(v) AS n FROM vecs").collect().head
    assert(r.getDouble(0) === 14.0 && r.getDouble(1) === 14.0)
  }

  test("json array sink matches the reference's response shape and cap") {
    val df = spark.range(0, 500).selectExpr("id", "id * 2 AS dbl")
    val json = Sinks.jsonArray(df, limit = 100)
    val parsed = spark.read.json(Seq(json.stripPrefix("[").stripSuffix("]")
      .split("(?<=\\}),(?=\\{)").toSeq: _*).toDS())
    assert(parsed.count() === 100) // capped like the reference viz payload
    assert(parsed.columns.sorted === Array("dbl", "id"))
  }

  test("vizPayload: numeric path is the reference's averages bar chart") {
    val df = Seq((1.0, 10L, "a"), (3.0, 30L, "b")).toDF("x", "y", "s")
    val json = graft.query.QueryJson.vizPayload(df)
    assert(json ===
      """{"type":"bar","data":{"labels":["x","y"],""" +
        """"datasets":[{"label":"Average","data":[2.0,20.0]}]},"options":{}}""")
  }

  test("vizPayload: categorical path counts the first string column") {
    val df = Seq(("a", "z"), ("b", "z"), ("a", "z")).toDF("k", "k2")
    val json = graft.query.QueryJson.vizPayload(df)
    assert(json ===
      """{"type":"bar","data":{"labels":["a","b"],""" +
        """"datasets":[{"label":"k count","data":[2,1]}]},"options":{}}""")
  }

  test("vizPayload: no chartable columns falls back to a table config") {
    val df = Seq(Tuple1(Array(1.0))).toDF("v")
    val json = graft.query.QueryJson.vizPayload(df)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(node.get("type").asText() === "table")
    assert(node.at("/data/columns/0").asText() === "v")
    assert(node.at("/data/rows").size() === 1)
  }

  test("vizPayload: all-null numeric column averages to 0.0 like the reference") {
    val df = Seq((None: Option[Double], "a")).toDF("x", "s")
    val json = graft.query.QueryJson.vizPayload(df)
    assert(json.contains(""""data":[0.0]"""))
  }

  test("json file sink round-trips") {
    val dir = Files.createTempDirectory("graft-json").toString + "/out"
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sinks.writeJson(df, dir)
    val back = spark.read.json(dir)
    assert(back.count() === 2)
    assert(back.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "b")))
  }

  test("insights JSON is valid and carries the reference field names") {
    val df = Seq((1.0, 2.0, "x"), (2.0, 4.0, "y"), (3.0, 6.0, "x")).toDF("v", "w", "c")
    val json = graft.profile.InsightsJson.render(Profiler.profile(df))
    val parsed = spark.read.json(Seq(json).toDS())
    assert(json.contains(""""ai_analysis":null""")) // reference shape parity
    assert(parsed.columns.sorted ===
      Array("ai_analysis", "column_statistics", "correlations", "data_summary"))
    val row = parsed.selectExpr("data_summary.row_count",
      "data_summary.numeric_columns", "column_statistics[0].name",
      "column_statistics[0].mean").collect().head
    assert(row.getLong(0) === 3L)
    assert(row.getSeq[String](1) === Seq("v", "w"))
    assert(row.getString(2) === "v")
    assert(row.getString(3) === "2.00") // "%.2f" string at the edge
    assert(parsed.selectExpr("correlations.`v-w`").collect().head.getString(0)
      === "1.0000") // perfectly linear fixture
  }

  test("AISummary: fallback policy and serialized shape match the reference") {
    import graft.model.{AISummary, VisualizationRecommendation}
    // empty result and outright failure both resolve to the fallback
    val empty = AISummary("  ", Nil, Nil, Nil)
    assert(empty.isEmpty)
    val fb = AISummary.validated(Some(empty), Some("AI timeout after 15 seconds (attempt 2)"))
    assert(fb.summary === "AI analysis could not be generated at this time. " +
      "Last error: AI timeout after 15 seconds (attempt 2)")
    assert(AISummary.validated(None).summary.endsWith("Last error: Unknown"))
    assert(fb.keyInsights === Seq("No insights could be generated from the data."))
    // a real summary passes through untouched
    val real = AISummary("sales trend up", Seq("k1"), Nil,
      Seq(VisualizationRecommendation("bar", "t", "d", Seq("a", "b"))))
    assert(AISummary.validated(Some(real)) === real)
    // serialized inside the Insights document with reference field names
    val df = Seq((1.0, "x")).toDF("v", "c")
    val json = graft.profile.InsightsJson.render(Profiler.profile(df), Some(real))
    val parsed = spark.read.json(Seq(json).toDS())
    val row = parsed.selectExpr("ai_analysis.summary",
      "ai_analysis.key_insights", "ai_analysis.visualization_recommendations[0].chart_type",
      "ai_analysis.visualization_recommendations[0].columns").collect().head
    assert(row.getString(0) === "sales trend up")
    assert(row.getSeq[String](1) === Seq("k1"))
    assert(row.getString(2) === "bar")
    assert(row.getSeq[String](3) === Seq("a", "b"))
  }

  test("partitioned parquet lake write: one directory per partition key") {
    val out = Files.createTempDirectory("graft-lake").toString + "/docs"
    val df = Seq((1L, "en", "a"), (2L, "fr", "b"), (3L, "en", "c"))
      .toDF("doc_id", "lang", "text")
    df.write.partitionBy("lang").mode("overwrite").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs === Set("lang=en", "lang=fr"))
    // partition pruning: a lang filter reads only that directory
    val scan = spark.read.parquet(out).filter($"lang" === "en")
    assert(scan.count() === 2)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || scan.inputFiles.forall(_.contains("lang=en")))
  }

  test("writePartitioned: one file per partition, split count honored") {
    import org.apache.spark.sql.functions.input_file_name
    val base = Files.createTempDirectory("graft-wp").toString
    val df = (1L to 300L).map(i => (i, s"k${i % 3}", s"v$i"))
      .toDF("id", "k", "v")
    // default: rows repartition BY the partition column first -> exactly
    // one file per partition directory (not one per input task per dir)
    Sinks.writePartitioned(df, s"$base/one", Seq("k"))
    val one = spark.read.parquet(s"$base/one")
    assert(one.count() === 300L)
    val filesPerDir = one.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
      .groupBy(f => f.split("/").takeWhile(!_.startsWith("part-")).last)
    assert(filesPerDir.keySet === Set("k=k0", "k=k1", "k=k2"))
    filesPerDir.values.foreach(fs => assert(fs.length === 1))
    // filesPerPartition=2: deterministic row-hash split BOUNDS each dir
    // at 2 files (split groups hashing to one shuffle task may merge)
    Sinks.writePartitioned(df, s"$base/two", Seq("k"), filesPerPartition = 2)
    val two = spark.read.parquet(s"$base/two")
    assert(two.count() === 300L)
    val files2 = two.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
      .groupBy(f => f.split("/").takeWhile(!_.startsWith("part-")).last)
    files2.values.foreach(fs => assert(fs.length >= 1 && fs.length <= 2))
    assert(files2.values.map(_.length).sum > 3,
      "the split must actually spread rows beyond one file per dir")
    // sortCols: rows sorted within each file for tight min/max bands
    Sinks.writePartitioned(df, s"$base/sorted", Seq("k"), sortCols = Seq("id"))
    val sorted = spark.read.parquet(s"$base/sorted").filter($"k" === "k1")
      .select("id").collect().map(_.getLong(0))
    assert(sorted.toSeq === sorted.sorted.toSeq)
  }

  test("range-sorted layout gives files disjoint min/max bands") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dst = java.nio.file.Files.createTempDirectory("layout").toString + "/t"
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("id", pmod(hash(col("id")), lit(10000))) // scrambled input
    Sinks.writeRangeSorted(df, dst, Seq("id"), partitions = 4)
    // per-file bands must not overlap: that's what makes footer pruning work
    val bands = spark.read.parquet(dst)
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .orderBy("lo").collect()
    assert(bands.length === 4)
    bands.sliding(2).foreach { case Array(a, b) =>
      assert(a.getInt(2) <= b.getInt(1), "file bands must be disjoint")
    }
    assert(spark.read.parquet(dst).count() === 10000L)
  }

  test("compaction merges a small-files directory, preserving rows") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("frag").toString
    val dst = src + "_compact"
    spark.range(0, 10000).toDF("id").repartition(40)
      .write.mode("overwrite").parquet(src)
    val (before, after) = Sinks.compactParquet(spark, src, dst,
      targetFileBytes = 512L * 1024)
    assert(before === 40)
    assert(after < before)
    assert(spark.read.parquet(dst).count() === 10000L)
    assert(spark.read.parquet(dst).agg(org.apache.spark.sql.functions.sum("id"))
      .first().getLong(0) === 10000L * 9999 / 2)
  }

  test("schema evolution: mergeSchema unions columns across parquet batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    // batch 1: (doc_id, text); batch 2 adds a lang column
    Seq((1L, "alpha")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Seq((2L, "beta", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("doc_id", "text", "lang"))
    val byId = merged.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("lang"))).toMap
    assert(byId(1L) === None)       // old rows: evolved column is null
    assert(byId(2L) === Some("en"))
  }

  test("csv source: header + inference, permissive on malformed rows") {
    val p = Files.createTempDirectory("graft-csv").resolve("t.csv")
    Files.writeString(p, "a,b,c\n1,x,2.5\n2,y,3.5\nnot_an_int,z,oops\n")
    val df = Tables.csv(spark, p.toString)
    assert(df.columns === Array("a", "b", "c"))
    assert(df.count() === 3) // malformed row kept as nulls, not a failure
    val types = df.schema.fields.map(_.dataType.simpleString).toSeq
    assert(types.head === "string" || types.head === "int") // inference ran
  }

  test("csvInferFirstRows freezes the reference's 100-row window semantics") {
    val p = Files.createTempDirectory("graft-csv100").resolve("t.csv")
    // numeric for the first rows, textual later: the reference's window
    // keeps the column numeric; whole-file inference widens to string
    Files.writeString(p,
      "a,b\n" + (1 to 5).map(i => s"$i,x$i").mkString("\n") + "\nnot_a_number,y\n")
    val windowed = Tables.csvInferFirstRows(spark, p.toString, rows = 5)
    assert(windowed.schema("a").dataType.simpleString === "int")
    assert(windowed.count() === 6)
    // the non-conforming late cell nulls out under PERMISSIVE
    assert(windowed.filter(windowed("a").isNull).count() === 1)
    val whole = Tables.csv(spark, p.toString)
    assert(whole.schema("a").dataType.simpleString === "string")
  }

  test("partitioned compaction: per-dir merge keeps layout and rows") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("pfrag").toString
    val dst = src + "_compact"
    spark.range(0, 6000).toDF("id")
      .withColumn("lang",
        org.apache.spark.sql.functions.expr("CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'fr' ELSE 'de' END"))
      .repartition(10)
      .write.partitionBy("lang").mode("overwrite").parquet(src)
    val report = Sinks.compactPartitionedParquet(spark, src, dst,
      targetFileBytes = 512L * 1024)
    assert(report.keySet === Set("lang=en", "lang=fr", "lang=de"))
    report.values.foreach { case (before, after) => assert(after <= before) }
    val back = spark.read.parquet(dst)
    assert(back.count() === 6000L)
    // partition column survives as a directory-derived column
    assert(back.select("lang").distinct().as[String].collect().toSet
      === Set("en", "fr", "de"))
  }

  test("GraftSession clone carries the zstd parquet codec") {
    val s = GraftSession.local(4)
    assert(s.conf.get("spark.sql.parquet.compression.codec") === "zstd")
  }
}
