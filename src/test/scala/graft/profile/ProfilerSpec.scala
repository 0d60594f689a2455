package graft.profile

import org.apache.spark.sql.Row

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  // nulls everywhere the reference is sloppy: stats must be null-aware
  private lazy val df = Seq(
    (Some(1.0), Some(10.0), Some("a")),
    (Some(2.0), Some(20.0), Some("b")),
    (Some(3.0), Some(30.0), Some("a")),
    (Some(4.0), None,       Some("a")),
    (None,      Some(50.0), None)
  ).toDF("x", "y", "cat")

  test("null and unique counts (unique ignores nulls — SURVEY A6 decision)") {
    val rows = Profiler.nullUniqueDF(df, includeApprox = false).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("x") === ((1L, 4L)))
    assert(rows("y") === ((1L, 4L)))
    assert(rows("cat") === ((1L, 2L)))
  }

  test("numeric stats: single pass, null-aware, quantile monotonic") {
    val r = Profiler.numericStatsDF(df, Seq("x")).collect().head
    assert(r.getString(0) === "x")
    assert(r.getLong(1) === 1L)          // null_count
    assert(r.getDouble(2) === 1.0)       // min
    assert(r.getDouble(3) === 4.0)       // max
    assert(r.getDouble(4) === 2.5)       // mean of 1,2,3,4
    val p25 = r.getDouble(6); val med = r.getDouble(7); val p75 = r.getDouble(8)
    assert(p25 <= med && med <= p75)     // monotonicity
    assert(med === 2.5)                  // linear interpolation over 1,2,3,4
  }

  test("correlations: |corr| <= 1, pairwise-complete, reference key format") {
    val rows = Profiler.correlationsDF(df, Seq("x", "y")).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "x-y")
    // pairwise-complete rows: (1,10),(2,20),(3,30) → perfectly linear
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("frequent values: true top-k, deterministic tie-break, nulls excluded") {
    val out = Profiler.frequentValuesDF(df, "cat", 10).collect()
    assert(out.head === Row("a", 3L))
    assert(out.map(_.getString(0)) === Array("a", "b")) // no null row
  }

  test("full profile assembles Insights with classification") {
    val ins = Profiler.profile(df)
    assert(ins.dataSummary.rowCount === 5)
    assert(ins.dataSummary.numericColumns === Seq("x", "y"))
    assert(ins.dataSummary.categoricalColumns === Seq("cat"))
    val x = ins.columnStatistics.find(_.name == "x").get
    assert(x.nullCount === 1 && x.uniqueCount === 4)
    assert(x.mean.contains(2.5))
    val cat = ins.columnStatistics.find(_.name == "cat").get
    assert(cat.min.isEmpty && cat.frequentValues.get.head === ("a" -> 3L))
    assert(ins.correlations.keySet === Set("x-y"))
  }

  test("approx path (exact=false) tracks exact percentiles closely") {
    val big = spark.range(0, 10000).selectExpr("CAST(id AS DOUBLE) AS v")
    val exact = Profiler.numericStatsDF(big, Seq("v"), exact = true).collect().head
    val approx = Profiler.numericStatsDF(big, Seq("v"), exact = false).collect().head
    // p25/median/p75 within 1% of the exact values on uniform data
    Seq(6, 7, 8).foreach { i =>
      assert(math.abs(exact.getDouble(i) - approx.getDouble(i))
        <= 0.01 * 10000, s"field $i diverged")
    }
    assert(exact.getDouble(2) === approx.getDouble(2)) // min is exact in both
  }

  test("date stats: range, nulls, distinct days") {
    val d = Seq(
      (1L, Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))),
      (2L, Some(java.sql.Timestamp.valueOf("2024-01-01 23:00:00"))),
      (3L, Some(java.sql.Timestamp.valueOf("2024-03-05 00:00:00"))),
      (4L, None)
    ).toDF("id", "ts")
    val r = Profiler.dateStatsDF(d, Seq("ts")).collect().head
    assert(r.getLong(1) === 1L) // nulls
    assert(r.getTimestamp(2) === java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(r.getTimestamp(3) === java.sql.Timestamp.valueOf("2024-03-05 00:00:00"))
    assert(r.getLong(4) === 2L) // distinct days
  }

  test("histogram: counts cover all rows, max lands in last bucket, constant col safe") {
    val d = (1 to 100).map(_.toDouble).toDF("v")
    val h = Profiler.histogramDF(d, "v", 10).collect()
    assert(h.map(_.getLong(3)).sum === 100L)
    assert(h.map(_.getInt(0)).toSet === (0 to 9).toSet) // max(100) in bucket 9
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val hc = Profiler.histogramDF(const, "v", 4).collect()
    assert(hc.map(_.getLong(3)).sum === 3L) // no div-by-zero
  }

  test("histogram of empty / all-null input returns empty, not a crash") {
    val empty = spark.emptyDataFrame.selectExpr("CAST(1.0 AS DOUBLE) AS v").limit(0)
    assert(Profiler.histogramDF(empty, "v", 5).count() === 0)
    val allNull = Seq.fill(3)(Option.empty[Double]).toDF("v")
    assert(Profiler.histogramDF(allNull, "v", 5).count() === 0)
  }

  test("batched frequent values equal the per-column operator") {
    val d = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("a", "x"))
      .toDF("c1", "c2")
    val batched = Profiler.frequentValuesAllDF(d, Seq("c1", "c2"), 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    Seq("c1", "c2").foreach { c =>
      val single = Profiler.frequentValuesDF(d, c, 10)
        .collect().map(r => (c, r.getString(0)) -> r.getLong(1)).toMap
      single.foreach { case (k, v) => assert(batched(k) === v) }
    }
  }

  test("exact=false profile avoids exact distinct and still fills uniqueCount") {
    val d = Seq((1.0, "a"), (2.0, "b"), (3.0, "a")).toDF("v", "c")
    val ins = Profiler.profile(d, exact = false)
    val c = ins.columnStatistics.find(_.name == "c").get
    assert(c.uniqueCount >= 1L) // approx estimate present (exact would be 2)
  }

  test("keySkewDF: shares sum to the hot keys' true fraction") {
    val df = (Seq.fill(60)("hot") ++ Seq("a", "b", "c", "d"))
      .zipWithIndex.map { case (k, i) => (k, i) }
      .toDF("key_col", "v")
    val top = Profiler.keySkewDF(df, "key_col", 2).collect()
    assert(top(0).getString(0) === "hot")
    assert(top(0).getLong(1) === 60L)
    assert(math.abs(top(0).getDouble(2) - 60.0 / 64.0) < 1e-4)
    assert(top.length === 2)
  }

  test("iqrOutliersDF computes Tukey fences and outside counts per group") {
    // group a: 0..99 plus one far-high point. Exact percentile over the
    // 101 sorted values hits integer ranks: p25=25, p75=75, iqr=50
    // -> fences [-50, 150]; only the planted 500 is outside.
    val a = (0 to 99).map(v => ("a", v.toDouble)) :+ (("a", 500.0))
    // group b: same shape mirrored low, plus a null (ignored)
    val b = (0 to 99).map(v => ("b", v.toDouble)) :+ (("b", -500.0))
    val df = (a ++ b).toDF("g", "v")
      .union(Seq(("b", Option.empty[Double])).toDF("g", "v"))
    val out = Profiler.iqrOutliersDF(df, "g", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out("a") === ((101L, 0L, 1L, -50.0, 150.0)))
    // b's sorted order is -500,0..99: quartile ranks land one lower
    // (p25=24, p75=74) -> fences [-51, 149]
    assert(out("b") === ((101L, 1L, 0L, -51.0, 149.0)))
  }

  test("winsorizedStatsDF clips the tail out of the mean") {
    // 1..99 plus a planted 10000: p05/p95 interpolate to 5.95 / 95.05;
    // clipped sum = 5*5.95 + (6..95) + 5*95.05 = 5050 -> mean 50.5
    val df = ((1 to 99).map(v => ("a", v.toDouble)) :+ (("a", 10000.0)))
      .toDF("g", "v")
    val r = Profiler.winsorizedStatsDF(df, "g", "v").collect().head
    assert(r.getString(0) === "a")
    assert(r.getLong(1) === 100L)
    assert(r.getDouble(2) === 149.5)  // raw mean dragged by the tail
    assert(r.getDouble(3) === 50.5)   // winsorized mean is not
    assert(r.getDouble(4) === 5.95)
    assert(r.getDouble(5) === 95.05)
  }

  test("winsorizedStatsDF approx path (exact=false) tracks exact") {
    // the unbounded-corpus escape: clip bounds from approx_percentile
    // instead of buffering every group value in the agg buffer
    val df = ((1 to 2000).map(v => ("a", v.toDouble)) :+ (("a", 1e6)))
      .toDF("g", "v")
    val ex = Profiler.winsorizedStatsDF(df, "g", "v").collect().head
    val ap = Profiler.winsorizedStatsDF(df, "g", "v", exact = false)
      .collect().head
    assert(ap.getLong(1) === ex.getLong(1))
    assert(ap.getDouble(2) === ex.getDouble(2))  // raw mean: identical
    // winsorized mean and bounds: approx sketch within 1% of exact
    assert(math.abs(ap.getDouble(3) - ex.getDouble(3)) <
      0.01 * math.abs(ex.getDouble(3)))
    assert(math.abs(ap.getDouble(4) - ex.getDouble(4)) <
      0.01 * math.max(1.0, math.abs(ex.getDouble(4))))
    assert(math.abs(ap.getDouble(5) - ex.getDouble(5)) <
      0.01 * math.abs(ex.getDouble(5)))
  }

  test("iqrOutliersDF reports the null group instead of orphaning it") {
    val df = ((0 to 99).map(v => (Option.empty[String], v.toDouble)) :+
        ((Option.empty[String], 500.0)) :+ (Some("a"), 1.0))
      .toDF("g", "v")
    val rows = Profiler.iqrOutliersDF(df, "g", "v").collect()
    val nullRow = rows.find(_.isNullAt(0))
    assert(nullRow.isDefined, "null group must appear in the audit")
    assert(nullRow.get.getLong(1) === 101L)
    assert(nullRow.get.getLong(3) === 1L) // the planted 500 outlier
  }

  test("profile of a single-row table does not crash (std dev undefined)") {
    val one = Seq((1.0, "z")).toDF("v", "c")
    val ins = Profiler.profile(one)
    val v = ins.columnStatistics.find(_.name == "v").get
    assert(v.stdDev.isEmpty || v.stdDev.contains(Double.NaN) || v.stdDev.isDefined)
    assert(ins.dataSummary.rowCount === 1)
  }

  test("jsonKeyProfileDF: per-key presence, token-text types, distinct, malformed row") {
    val df = Seq(
      """{"a": 5, "b": "x"}""",
      """{"a": -17, "b": "5", "c": true}""",   // "5" quoted still types int
      """{"a": 2.50, "c": false}""",
      """{"a": 5}""",
      """not json at all""",
      null.asInstanceOf[String]                 // null row: ignored entirely
    ).toDF("j")
    val out = Profiler.jsonKeyProfileDF(df, "j").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // a: 5, -17, 2.50, 5 -> 3 int + 1 float, 3 distinct value strings
    assert(out("a") === ((4L, 3L, 1L, 0L, 0L, 3L)))
    // b: "x", "5" -> the schema-inference stance types by token text
    assert(out("b") === ((2L, 1L, 0L, 0L, 1L, 2L)))
    assert(out("c") === ((2L, 0L, 0L, 2L, 0L, 2L)))
    assert(out("__malformed") === ((1L, 0L, 0L, 0L, 0L, 0L)))
    assert(out.size === 4)
    // an all-clean column still carries the (zero) malformed row
    val clean = Profiler.jsonKeyProfileDF(Seq("""{"z": 1}""").toDF("j"), "j")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean === Map("z" -> 1L, "__malformed" -> 0L))
  }

  test("kAnonymityDF: class sizes, at-risk flag, null is a class value") {
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"),
      ("fr", "web"),
      (null.asInstanceOf[String], "web"),
      (null.asInstanceOf[String], "web")
    ).toDF("lang", "source")
    val out = Profiler.kAnonymityDF(df, Seq("lang", "source"), k = 3)
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    assert(out((Some("en"), "web")) === ((3L, 0)))
    assert(out((Some("fr"), "web")) === ((1L, 1)))
    assert(out((None, "web")) === ((2L, 1))) // the null class is audited too
    assert(out.size === 3)
  }

  test("kAnonymityLDiversityDF: a k-anonymous class with one sensitive value is at risk; null is a sensitive value") {
    val df = Seq(
      // class A: 3 rows, all lang=en -> k ok (k=3) but l=1 -> at risk
      ("web", "en"), ("web", "en"), ("web", "en"),
      // class B: 3 rows, en/fr -> l=2 -> safe
      ("pdf", "en"), ("pdf", "fr"), ("pdf", "en"),
      // class C: 3 rows, en + NULL -> null counts as a value -> l=2 safe
      ("api", "en"), ("api", null.asInstanceOf[String]), ("api", "en")
    ).toDF("source", "lang")
    val out = Profiler.kAnonymityLDiversityDF(df, Seq("source"), "lang",
        k = 3, l = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out("web") === ((3L, 1L, 1)), "uniform sensitive value leaks")
    assert(out("pdf") === ((3L, 2L, 0)))
    assert(out("api") === ((3L, 2L, 0)), "withheld is a distinct value")
    intercept[IllegalArgumentException] {
      Profiler.kAnonymityLDiversityDF(df, Seq("lang"), "lang")
    }
  }

  test("calibrationBins: clamped margin bins, exact rates and means, null rows excluded") {
    // bins over [-1, 1) with width 0.5: bin 0 = [-1,-0.5), ..., bin 3 = [0.5,1)
    val df = Seq(
      (-2.0, 0),            // clamps into bin 0
      (-0.75, 0), (-0.6, 1),
      (0.1, 1), (0.2, 1), (0.3, 0), (0.4, 0),
      (1.5, 1)              // clamps into bin 3
    ).toDF("score", "label")
      .union(Seq((null.asInstanceOf[java.lang.Double], 1))
        .toDF("score", "label"))
    val out = Profiler.calibrationBins(df, "score", "label",
        lo = -1.0, hi = 1.0, nBins = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(0L) === ((3L, 1L, 0.333333, -1.116667)),
      "out-of-range scores clamp into the edge bin")
    assert(out(2L) === ((4L, 2L, 0.5, 0.25)))
    assert(out(3L) === ((1L, 1L, 1.0, 1.5)))
    assert(out.size === 3, "null-score rows are excluded, empty bins absent")
  }

  test("numericDriftDF: clamped bins, exact KS and TVD, one-sided bins kept") {
    val a = Seq(1.0, 1.0, 3.0, 5.0, 9.0).toDF("v")          // Na = 5
    val b = Seq(0.0, 2.0, 2.0, 6.0, 11.0, -1.0).toDF("v")    // Nb = 6
    val out = Profiler.numericDriftDF(a, b, "v", lo = 0.0, hi = 10.0,
        nBins = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // 11.0 and -1.0 clamp into the edge bins instead of vanishing
    assert(out(0L) === ((2L, 2L, 0.066667, 0.133333, 0.3)))
    assert(out(1L) === ((1L, 2L, 0.066667, 0.133333, 0.3)))
    assert(out(2L) === ((1L, 0L, 0.133333, 0.133333, 0.3)),
      "a bin present on one side only must keep its zero row")
    assert(out(3L) === ((0L, 1L, 0.033333, 0.133333, 0.3)))
    assert(out(4L) === ((1L, 1L, 0.0, 0.133333, 0.3)))
    assert(out.size === 5)
    // identical snapshots: zero drift on every statistic
    val same = Profiler.numericDriftDF(a, a, "v", 0.0, 10.0, 5)
      .collect().map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(same.forall(_ == ((0.0, 0.0, 0.0))))
    // an empty side yields null statistics, never NaN
    val empty = a.filter(org.apache.spark.sql.functions.col("v") < -100)
    val nulls = Profiler.numericDriftDF(a, empty, "v", 0.0, 10.0, 5)
      .collect()
    assert(nulls.nonEmpty && nulls.forall(r => r.isNullAt(3) &&
      r.isNullAt(4) && r.isNullAt(5)))
  }

  test("tClosenessDF: TVD vs the global sensitive mix, absent values counted, null is a value") {
    val df = Seq(
      // global mix: en 5/8, fr 2/8, null 1/8
      ("web", "en"), ("web", "en"), ("web", "en"), ("web", "en"),
      ("pdf", "en"), ("pdf", "fr"),
      ("api", "fr"), ("api", null.asInstanceOf[String])
    ).toDF("source", "lang")
    val out = Profiler.tClosenessDF(df, Seq("source"), "lang", t = 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    // web: all-en, TVD = (|4*8-5*4| + 4*(8-5)) / (2*4*8) = 0.375
    assert(out("web") === ((4L, 0.375, 1)),
      "a class skewed to the majority value still leaks")
    // pdf: {en .5, fr .5} vs {.625, .25, .125} -> 0.25 (the absent
    // null value's mass must be counted, not dropped by the join)
    assert(out("pdf") === ((2L, 0.25, 0)))
    // api: {fr .5, null .5} -> 0.625; "withheld" is a sensitive value
    assert(out("api") === ((2L, 0.625, 1)))
    assert(out.size === 3)
    intercept[IllegalArgumentException] {
      Profiler.tClosenessDF(df, Seq("lang"), "lang")
    }
  }

  test("categoryShareDrift: one-sided categories keep zero rows; shares snap exactly") {
    val a = Seq("x", "x", "y", "z", null.asInstanceOf[String])
      .toDF("event_type")
    val b = Seq("x", "y", "y", "y").toDF("event_type")
    val out = Profiler.categoryShareDrift(a, b, "event_type")
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out(Some("x")) === ((2L, 1L, 0.4, 0.25, 0.15)))
    assert(out(Some("y")) === ((1L, 3L, 0.2, 0.75, -0.55)))
    assert(out(Some("z")) === ((1L, 0L, 0.2, 0.0, 0.2)),
      "a category that vanished must keep a zero row")
    assert(out(None) === ((1L, 0L, 0.2, 0.0, 0.2)),
      "null is a category like any other")
    assert(out.size === 4)
  }
}
