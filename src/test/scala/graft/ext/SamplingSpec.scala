package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = spark.range(0, 10000).toDF("id")

  test("hashSample is deterministic and close to the target fraction") {
    val a = Sampling.hashSample(ids, "id", 0.1, "s1")
    val n = a.count()
    assert(n > 800 && n < 1200, s"10% of 10k sampled $n")
    // same salt → identical membership; different salt → different sample
    assert(Sampling.hashSample(ids, "id", 0.1, "s1").count() === n)
    val other = Sampling.hashSample(ids, "id", 0.1, "s2")
    assert(a.join(other, Seq("id"), "left_semi").count() < n)
  }

  test("hashSample membership is stable under repartitioning") {
    val before = Sampling.hashSample(ids, "id", 0.05, "s1")
      .collect().map(_.getLong(0)).toSet
    val after = Sampling.hashSample(ids.repartition(13), "id", 0.05, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(before === after)
  }

  test("hashSample edge fractions: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.hashSample(ids, "id", 0.0).count() === 0L)
    assert(Sampling.hashSample(ids, "id", 1.0).count() === 10000L)
  }

  test("smaller fraction is a subset of larger (nested samples)") {
    val small = Sampling.hashSample(ids, "id", 0.02, "s1")
    val large = Sampling.hashSample(ids, "id", 0.2, "s1")
    assert(small.join(large, Seq("id"), "left_anti").count() === 0L)
  }

  test("stratifiedHashSample respects per-stratum fractions") {
    val df = ids.withColumn("lang",
      when(col("id") % 2 === 0, "en").otherwise("de"))
    val s = Sampling.stratifiedHashSample(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.05))
    val byLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") > 2200 && byLang("en") < 2800, byLang)
    assert(byLang("de") > 150 && byLang("de") < 350, byLang)
  }

  test("stratifiedHashSample drops strata absent from the map by default") {
    val df = ids.withColumn("lang",
      when(col("id") % 2 === 0, "en").otherwise("xx"))
    val s = Sampling.stratifiedHashSample(df, "id", "lang", Map("en" -> 1.0))
    assert(s.filter(col("lang") === "xx").count() === 0L)
    assert(s.filter(col("lang") === "en").count() === 5000L)
  }

  test("trainTestSplit is disjoint, exhaustive, and key-stable") {
    val s = Sampling.trainTestSplit(ids, "id", 0.25, "s1")
    assert(s.count() === 10000L)
    val test = s.filter(col("split") === "test").count()
    assert(test > 2200 && test < 2800, s"25% split got $test")
    // key-stable: membership unchanged when rows are added
    val grown = Sampling.trainTestSplit(
      spark.range(0, 20000).toDF("id"), "id", 0.25, "s1")
    val before = s.filter(col("split") === "test")
      .collect().map(_.getLong(0)).toSet
    val after = grown.filter(col("split") === "test" && col("id") < 10000)
      .collect().map(_.getLong(0)).toSet
    assert(before === after)
  }

  test("capPerGroup keeps at most k rows per group, by the given order") {
    val df = Seq(
      ("a", 1L, 10), ("a", 2L, 30), ("a", 3L, 20), ("a", 4L, 30),
      ("b", 5L, 5)).toDF("g", "id", "score")
    val capped = Sampling.capPerGroup(df, Seq("g"),
      Seq(col("score").desc, col("id").asc), k = 2)
    val a = capped.filter(col("g") === "a").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a === Set(2L, 4L)) // the two score-30 rows; id asc breaks the tie
    assert(capped.filter(col("g") === "b").count() === 1L)
  }

  test("ntileBuckets: near-equal bucket sizes, ordered ranges") {
    val df = graft.io.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
    val b = Sampling.ntileBuckets(df, "o_totalprice", "o_orderkey", 4)
    val sizes = b.groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === Set(1, 2, 3, 4))
    assert(sizes.values.max - sizes.values.min <= 1)
    val ranges = b.groupBy("bucket")
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .orderBy("bucket").collect()
    ranges.sliding(2).foreach { case Array(a, c) =>
      assert(a.getDouble(2) <= c.getDouble(1), "bucket ranges must not invert")
    }
  }

  test("quantileBuckets (approx scale path) tracks ntile bucket sizes") {
    val df = graft.io.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
    val n = df.count()
    val approx = Sampling.quantileBuckets(df, "o_totalprice", 4)
    val sizes = approx.groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === Set(1, 2, 3, 4))
    // each bucket within 5% of the ideal quarter
    sizes.values.foreach(s =>
      assert(math.abs(s - n / 4.0) < n * 0.05, s"bucket size $s vs ideal ${n / 4}"))
  }

  test("exactQuantileThresholds: interpolated quartiles match a driver-side sort") {
    val df = graft.io.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
    val ts = Sampling.exactQuantileThresholds(df, "o_totalprice", 4)
    // independent oracle: quantile_cont definition over a plain sorted array
    val vals = df.select("o_totalprice").collect().map(_.getDouble(0)).sorted
    val expected = Seq(0.25, 0.5, 0.75).map { p =>
      val pos = p * (vals.length - 1)
      val lo = pos.toInt
      val v = vals(lo) + (pos - lo) * (vals(math.min(lo + 1, vals.length - 1)) - vals(lo))
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(ts === expected)
    // bucketByThresholds: exhaustive, ordered, sizes near quarters
    val b = Sampling.bucketByThresholds(df, "o_totalprice", ts)
    val sizes = b.groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === Set(1, 2, 3, 4))
    assert(sizes.values.sum === vals.length.toLong)
    sizes.values.foreach(s =>
      assert(math.abs(s - vals.length / 4.0) <= vals.length * 0.05))
    // the scale gate THROWS above maxRows (never a silent fallback):
    // exact percentile buffers every distinct value, so a corpus-sized
    // feed must be rejected loudly — the caller picks a fixed slice or
    // the approx quantileBuckets path instead
    val ex = intercept[IllegalArgumentException](
      Sampling.exactQuantileThresholds(df, "o_totalprice", 4,
        maxRows = (vals.length - 1).max(1)))
    assert(ex.getMessage.contains("exceeds"))
  }

  test("sampleByTokenBudget: budget honored per group, deterministic, salt redraws") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val s1 = TextAnalysis.sampleByTokenBudget(docs, "doc_id", "text", "lang", 2000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val s2 = TextAnalysis.sampleByTokenBudget(docs, "doc_id", "text", "lang", 2000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(s1.sortBy(_._1) === s2.sortBy(_._1)) // reproducible draw
    // per-group totals land in [min(budget, group total), budget + max
    // doc) — the fill keeps the straddling doc, never more
    val all = TextAnalysis.sampleByTokenBudget(docs, "doc_id", "text", "lang",
        Long.MaxValue)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val groupAll = all.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val perGroup = s1.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val maxDoc = s1.map(_._3).max
    perGroup.foreach { case (g, tot) =>
      assert(tot >= math.min(2000L, groupAll(g)), s"group $g under-filled: $tot")
      assert(tot < 2000L + maxDoc, s"group $g overshoots: $tot")
    }
    val redrawn = TextAnalysis.sampleByTokenBudget(docs, "doc_id", "text", "lang",
        2000L, salt = "other")
      .collect().map(r => r.getLong(0)).toSet
    assert(redrawn !== s1.map(_._1).toSet) // a new salt is a new draw
  }

  test("sampleByTokenBudget: duplicate ids get true ROWS prefixes, not peer sums") {
    // two rows share id 7 (same sort key): with the default RANGE frame
    // both would see the peer-group total and the small row would be
    // dropped; the explicit ROWS frame keeps a true running prefix
    val df = Seq((7L, "a", "en"), (7L, ("w " * 3000).trim, "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.sampleByTokenBudget(df, "doc_id", "text", "lang", 2000L)
      .collect().map(_.getLong(2)).sorted
    assert(out.length === 2, s"both peer rows must be kept, got ${out.toSeq}")
    assert(out === Array(1L, 3000L))
  }

  test("shuffleShards: stable under repartitioning, contiguous positions") {
    val n = 2000L
    val rows = spark.range(0, n).toDF("id")
    val a = Sampling.shuffleShards(rows, "id", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val b = Sampling.shuffleShards(rows.repartition(13), "id", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(a === b, "layout must not depend on physical partitioning")
    // per-shard positions are exactly 1..count (dense, no gaps/dupes)
    a.values.groupBy(_._1).foreach { case (shard, grp) =>
      val ps = grp.map(_._2).toSeq.sorted
      assert(ps === (1 to ps.size).toSeq, s"shard $shard positions $ps")
    }
    // all shards populated and no shard hoards the corpus
    val sizes = a.values.groupBy(_._1).view.mapValues(_.size)
    assert(sizes.size === 8)
    assert(sizes.values.max < n / 8 * 2)
  }

  test("shuffleShards leaves a pre-existing 'h' column untouched") {
    val rows = spark.range(0, 50).toDF("id").withColumn("h", col("id") * 2)
    val out = Sampling.shuffleShards(rows, "id", 4)
    assert(out.columns.toSeq === Seq("id", "h", "shard", "pos"))
    assert(out.filter(col("h") =!= col("id") * 2).count() === 0L)
  }

  test("shuffleShards: a different salt produces a different layout") {
    val rows = spark.range(0, 500).toDF("id")
    val a = Sampling.shuffleShards(rows, "id", 4, "s1")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val b = Sampling.shuffleShards(rows, "id", 4, "s2")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(a !== b)
  }

  test("weightedSample: deterministic, repartition-stable, weight-proportional") {
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("w", when(col("id") < 100, 1000.0).otherwise(1.0))
    val a = Sampling.weightedSample(df, "id", "w", 100)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(df.repartition(13), "id", "w", 100)
      .collect().map(_.getLong(0)).toSet
    assert(a === b, "draw must not depend on physical partitioning")
    assert(a.size === 100)
    // 100 heavy rows at weight 1000 vs 1900 light at 1: the heavy set
    // dominates any weight-proportional draw
    val heavy = a.count(_ < 100)
    assert(heavy > 80, s"expected mostly heavy rows, got $heavy/100")
  }

  test("gumbelTopK: deterministic, repartition-stable, exp(logw)-proportional") {
    // two classes with log-weight gap 2 -> weight ratio e^2 ≈ 7.4: a
    // 50-draw from 100+100 rows should be DOMINATED by the high class
    // but not be exclusively it (it is a sample, not a weight top-k)
    val df = spark.range(1, 201).toDF("id")
      .withColumn("logw", when(col("id") <= 100, 2.0).otherwise(0.0))
    val a = Sampling.gumbelTopK(df, "id", "logw", n = 50)
      .collect().map(_.getLong(0))
    val b = Sampling.gumbelTopK(df.repartition(13), "id", "logw", n = 50)
      .collect().map(_.getLong(0))
    assert(a.toSeq === b.toSeq, "draw must not depend on partitioning")
    assert(a.length === 50 && a.distinct.length === 50)
    val high = a.count(_ <= 100)
    assert(high > 35 && high < 50,
      s"expected mostly (not only) high-weight rows, got $high/50")
    // equal log-weights: the draw must include LOW-class rows too when
    // weights tie (pure Gumbel noise = uniform draw)
    val uniform = Sampling.gumbelTopK(
        df.withColumn("logw", lit(0.0)), "id", "logw", n = 50)
      .collect().map(_.getLong(0))
    val lowHalf = uniform.count(_ > 100)
    assert(lowHalf > 13 && lowHalf < 37, s"uniform low-half $lowHalf")
    // null keys / log-weights are excluded, not NaN-ranked
    import spark.implicits._
    val withNulls = Seq((Some(1L), Some(1.0)), (None, Some(9.9)),
      (Some(3L), None: Option[Double])).toDF("id", "logw")
    val kept = Sampling.gumbelTopK(withNulls, "id", "logw", n = 10)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
  }

  test("weightedSample: equal weights approximate a uniform draw") {
    val df = spark.range(0, 2000).toDF("id").withColumn("w", lit(1.0))
    val s = Sampling.weightedSample(df, "id", "w", 400)
      .collect().map(_.getLong(0))
    assert(s.length === 400)
    // uniform draw: about half the sample below the median id
    val low = s.count(_ < 1000)
    assert(low > 140 && low < 260, s"low-half count $low")
  }

  test("weightedSamplePerGroup = weightedSample run on each group alone") {
    val df = spark.range(0, 600).toDF("id")
      .withColumn("grp", when(col("id") % 3 === 0, "a")
        .when(col("id") % 3 === 1, "b").otherwise("c"))
      .withColumn("w", col("id") % 7 + 1.0)
    val perGroup = Sampling.weightedSamplePerGroup(df, "id", "w", "grp", 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(perGroup.keySet === Set("a", "b", "c"))
    perGroup.foreach { case (g, ids) =>
      val alone = Sampling.weightedSample(
          df.filter(col("grp") === g), "id", "w", 5)
        .collect().map(_.getLong(0)).toSet
      assert(ids === alone, s"group $g")
      assert(ids.size === 5)
    }
  }

  test("weightedSample excludes null and non-positive weights") {
    val df = Seq(
      (1L, Some(5.0)), (2L, Some(0.0)), (3L, Some(-1.0)),
      (4L, None: Option[Double])
    ).toDF("id", "w")
    val s = Sampling.weightedSample(df, "id", "w", 10)
      .collect().map(_.getLong(0)).toSet
    assert(s === Set(1L))
  }

  test("mixturePlan: bottleneck group pins the total, shares realized exactly") {
    val df = Seq(
      ("en", 1000.0), ("en", 1000.0),   // available: en 2000
      ("fr", 300.0),                    // fr 300  <- bottleneck at 0.2
      ("zh", 500.0)                     // untargeted -> dropped
    ).toDF("lang", "w")
    val plan = Sampling.mixturePlan(df, "lang", "w",
        Map("en" -> 0.8, "fr" -> 0.2))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // T = min(2000/0.8, 300/0.2) = 1500; en keeps 0.8*1500/2000 = 0.6
    assert(plan("en") === ((2000.0, 0.8, Some(0.6), Some(1200.0))))
    assert(plan("fr") === ((300.0, 0.2, Some(1.0), Some(300.0)))) // consumed
    assert(plan("zh") === ((500.0, 0.0, Some(0.0), Some(0.0)))) // dropped, not null
    // realized mixture is exactly the target: kept_en/kept_fr = 4
    assert(plan("en")._4.get / plan("fr")._4.get === 4.0)
  }

  test("mixturePlan: a zero-supply targeted group gets its own NULL row, T = 0") {
    val df = Seq(("en", 100.0)).toDF("lang", "w")
    val rows = Sampling.mixturePlan(df, "lang", "w",
        Map("en" -> 0.5, "fr" -> 0.5)).collect()
    val plan = rows.map(r => r.getString(0) ->
      ((r.getDouble(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // fr has no corpus rows: it appears ANYWAY (available 0, NULL plan)
    // so the caller sees which group is short; the bottleneck T = 0
    // makes en keep exactly nothing — the mix cannot silently skew
    assert(plan.keySet === Set("en", "fr"))
    assert(plan("fr") === ((0.0, None, None)))
    assert(plan("en") === ((100.0, Some(0.0), Some(0.0))))
  }

  test("mixturePlan fractions drive stratifiedHashSample to the target mix") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.01")
    val targets = Map("en" -> 0.5, "de" -> 0.5)
    val plan = Sampling.mixturePlan(docs, "lang", "n_chars", targets)
      .filter($"target_share" > 0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val sampled = Sampling.stratifiedHashSample(
        docs, "doc_id", "lang", plan, defaultFraction = 0.0)
      .groupBy("lang").agg(sum($"n_chars").as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.keySet === Set("en", "de"))
    val total = sampled.values.sum.toDouble
    // hash sampling is ~proportional, not exact: generous band
    assert(math.abs(sampled("en") / total - 0.5) < 0.15,
      s"realized en share ${sampled("en") / total}")
  }

  test("output-name collisions fail loudly instead of clobbering data") {
    val df = Seq((1L, 2.0, 9, 9)).toDF("id", "w", "shard", "draw")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.shuffleShards(df, "id", nShards = 2)
    }
    assert(e1.getMessage.contains("shard"))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, "id", "w", 1)
    }
    assert(e2.getMessage.contains("draw"))
    val e3 = intercept[IllegalArgumentException] {
      Sampling.weightedSamplePerGroup(df, "id", "w", "shard", 1)
    }
    assert(e3.getMessage.contains("draw"))
    val df2 = Seq((1L, 2.0, "x", 9)).toDF("id", "w", "split", "bucket")
    assert(intercept[IllegalArgumentException] {
      Sampling.trainTestSplit(df2, "id", 0.2)
    }.getMessage.contains("split"))
    assert(intercept[IllegalArgumentException] {
      Sampling.ntileBuckets(df2, "w", "id", 2)
    }.getMessage.contains("bucket"))
    assert(intercept[IllegalArgumentException] {
      Sampling.bucketByThresholds(df2, "w", Seq(1.0))
    }.getMessage.contains("bucket"))
    assert(intercept[IllegalArgumentException] {
      Sampling.quantileBuckets(df2, "w", 2)
    }.getMessage.contains("bucket"))
  }

  test("weightedSample at roundTo=12 stays proportional for ~1e5 weights") {
    // weights far past the 6-dp grid's ~1e3 envelope: at roundTo=6 the
    // draws collapse into tie classes broken by ascending id (a
    // small-id-biased tail); at 12 the grid resolves them. Heavy
    // weights must win far more often than light ones.
    val df = (1L to 400L).map { i =>
      (i, if (i % 2 == 0) 200000.0 else 2000.0)
    }.toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", "w", 80, roundTo = 12)
      .collect().map(_.getLong(0))
    val heavy = picked.count(_ % 2 == 0)
    assert(heavy > 70, s"heavy-weight rows won only $heavy/80 draws")
    // and the draw column genuinely resolves at the finer grid: the
    // top-80 draws are distinct, not id-ordered tie runs
    val draws = Sampling.weightedSample(df, "id", "w", 80, roundTo = 12)
      .collect().map(_.getDouble(2))
    assert(draws.distinct.length > 70, "draws collapsed into tie classes")
  }

  test("capPerGroupAgg ≡ window capPerGroup, and its plan has no Window") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_chars")
    val agg = Sampling.capPerGroupAgg(docs, "lang", "doc_id",
      col("n_chars"), 3)
    assert(!agg.queryExecution.executedPlan.toString.contains("Window"),
      "the skew-safe twin must aggregate, not window-sort hot groups")
    val viaAgg = agg.collect().map(_.getLong(0)).toSet
    val viaWin = Sampling.capPerGroup(docs, Seq("lang"),
        Seq(col("n_chars").desc, col("doc_id").asc), 3)
      .collect().map(_.getLong(0)).toSet
    assert(viaAgg === viaWin)
  }

  test("capPerGroupAgg: skewed hot group stays capped; null group is " +
      "its own quota; NaN priority fails loudly") {
    // one group holds 90% of rows — the case the heap shape exists for
    val rows = (1L to 1000L).map { i =>
      (i, if (i <= 900) "hot" else if (i <= 950) null else "cold",
        (i % 97).toDouble)
    }
    val df = rows.toDF("id", "grp", "pri")
    val out = Sampling.capPerGroupAgg(df, "grp", "id", col("pri"), 5)
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(out.count(_._2.contains("hot")) === 5)
    assert(out.count(_._2.isEmpty) === 5, "null group keeps its own cap")
    assert(out.count(_._2.contains("cold")) === 5)
    // ties inside the cap break by id ascending, same as the window twin
    val expectHot = rows.filter(_._2 == "hot")
      .sortBy { case (id, _, p) => (-p, id) }.take(5).map(_._1).toSet
    assert(out.filter(_._2.contains("hot")).map(_._1).toSet === expectHot)
    val nan = df.withColumn("pri",
      when(col("id") === 7L, lit(Double.NaN)).otherwise(col("pri")))
    val ex = intercept[Exception] {
      Sampling.capPerGroupAgg(nan, "grp", "id", col("pri"), 5).collect()
    }
    assert(ex.getMessage != null)
  }

  test("capPerGroup on real data matches an independent driver-side rank") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_chars")
    val viaOp = Sampling.capPerGroup(docs, Seq("lang"),
      Seq(col("n_chars").desc, col("doc_id").asc), 3)
      .collect().map(_.getLong(0)).toSet
    // independent oracle: plain Scala collections, no Spark windows
    val expected = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2).values.flatMap { grp =>
        grp.sortBy { case (id, _, n) => (-n, id) }.take(3).map(_._1)
      }.toSet
    assert(viaOp === expected)
  }

  test("splitByComponent: cluster members never straddle the split") {
    import spark.implicits._
    val docs = spark.range(0, 2000).toDF("id")
    // clusters of 4 consecutive ids, chained pairwise (0-1, 1-2, 2-3)
    val pairs = (0L until 2000L).filter(i => i % 4 != 3)
      .map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
    val s = Sampling.splitByComponent(docs, "id", comps, 0.3, "s1")
    assert(s.count() === 2000L)
    val straddlers = s.groupBy("cluster")
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).count()
    assert(straddlers === 0L)
    // cluster label is the component min: 4 members per cluster
    val sizes = s.groupBy("cluster").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    assert(sizes === Set(4L))
    // ~30% of CLUSTERS land in test (the draw is per cluster, not per doc)
    val testClusters = s.filter(col("split") === "test")
      .select("cluster").distinct().count()
    assert(testClusters > 100 && testClusters < 200,
      s"expected ~150 of 500 clusters in test, got $testClusters")
  }

  test("splitByComponent: docs absent from the closure are singletons " +
      "and draw exactly like trainTestSplit on their own id") {
    val docs = spark.range(0, 1000).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
    val viaComponent = Sampling.splitByComponent(docs, "id", comps, 0.25, "sX")
      .filter(!col("id").isInCollection(Seq(1L, 2L, 3L)))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaKey = Sampling.trainTestSplit(docs, "id", 0.25, "sX")
      .filter(!col("id").isInCollection(Seq(1L, 2L, 3L)))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaComponent === viaKey)
  }

  test("tokenBudgetWaterfall: saturated prefix capped, rest split evenly, remainder deterministic") {
    import spark.implicits._
    val df = Seq(("a", 100L), ("b", 300L), ("c", 1000L), ("d", 0L))
      .toDF("lang", "toks")
    def run(b: Long) =
      Sampling.tokenBudgetWaterfall(df, "lang", "toks", b, maxEpochs = 2.0)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4),
            Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    // caps: a 200, b 600, c 2000, d 0; B = 1000 -> a,d saturate,
    // b and c split the remaining 800 evenly
    val out = run(1000L)
    assert(out("a") === ((100L, 200L, 200L, 1, Some(2.0))))
    assert(out("b") === ((300L, 600L, 400L, 0, Some(1.333333))))
    assert(out("c") === ((1000L, 2000L, 400L, 0, Some(0.4))))
    assert(out("d") === ((0L, 0L, 0L, 1, None)),
      "an empty group saturates at zero, never divides by zero")
    assert(out.values.map(_._3).sum === 1000L, "allocations spend exactly B")
    // B = 1001: the odd token goes to the FIRST unsaturated group in
    // (cap, name) order — deterministic, not engine-dependent
    val odd = run(1001L)
    assert(odd("b")._3 === 401L && odd("c")._3 === 400L)
    // budget above total capacity: everyone saturates at cap
    val rich = run(5000L)
    assert(rich.values.forall(v => v._3 === v._2 && v._4 === 1))
  }

  test("splitByComponent rejects null keys loudly") {
    import spark.implicits._
    val docs = Seq(Some(1L), Some(2L), None).toDF("id")
    val comps = Dedup.connectedComponents(Seq((1L, 2L)).toDF("id_a", "id_b"))
    val ex = intercept[Exception] {
      Sampling.splitByComponent(docs, "id", comps, 0.5, "s1").collect()
    }
    assert(ex.getMessage != null)
  }
}
