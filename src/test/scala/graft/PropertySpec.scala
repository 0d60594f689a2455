package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model._
import graft.model.ColumnOperation._
import graft.profile.Profiler
import graft.query.QueryCompiler

/** Property-based invariants (SURVEY.md §5.3). Spark jobs are not cheap,
  * so properties run with a reduced case count but unconstrained data.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic ScalaCheck sampling (no scalatest bridge in the
    * offline cache): n samples from fixed seeds. */
  private def samples[T](g: Gen[T], n: Int = 8): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    samples(g).foreach(f)
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    samples(Gen.zip(g1, g2)).foreach { case (a, b) => f(a, b) }

  private def whenever(c: Boolean)(body: => Unit): Unit = if (c) body

  private val rows = Gen.listOfN(40,
    Gen.zip(Gen.chooseNum(-1000.0, 1000.0), Gen.oneOf("a", "b", "c")))

  test("filter(p) and filter(not p) partition any table") {
    forAll(rows, Gen.chooseNum(-1000.0, 1000.0)) { (data, threshold) =>
      whenever(data.nonEmpty) {
        val df = data.toDF("v", "c")
        val p = QueryCompiler.compile(df, StructuredQuery(QueryIntent.Filter,
          operations = Seq(Filter("v", CompareOp.Ge, threshold.toString)))).count()
        val np = QueryCompiler.compile(df, StructuredQuery(QueryIntent.Filter,
          operations = Seq(Filter("v", CompareOp.Lt, threshold.toString)))).count()
        assert(p + np === data.size.toLong)
      }
    }
  }

  test("sort is a permutation of the input") {
    forAll(rows) { data =>
      whenever(data.nonEmpty) {
        val df = data.toDF("v", "c")
        val out = QueryCompiler.compile(df, StructuredQuery(QueryIntent.Sort,
          operations = Seq(SortBy("v", ascending = true))))
          .select("v").as[Double].collect().toSeq
        assert(out === out.sorted)
        assert(out === data.map(_._1).sorted)
      }
    }
  }

  test("profiler invariants: null bounds, quantile monotonicity, |corr| <= 1") {
    forAll(Gen.listOfN(30, Gen.zip(Gen.chooseNum(-100.0, 100.0),
      Gen.option(Gen.chooseNum(-100.0, 100.0))))) { data =>
      whenever(data.size >= 3) {
        val df = data.toDF("x", "y")
        val stats = Profiler.numericStatsDF(df, Seq("x", "y")).collect()
          .map(r => r.getString(0) -> r).toMap
        val n = data.size.toLong
        val yNulls = stats("y").getLong(1)
        assert(yNulls >= 0L && yNulls <= n)
        val sx = stats("x")
        assert(sx.getDouble(6) <= sx.getDouble(7) && sx.getDouble(7) <= sx.getDouble(8))
        if (data.count(_._2.isDefined) >= 2) {
          Profiler.correlationsDF(df, Seq("x", "y")).collect()
            .filterNot(_.isNullAt(1))
            .foreach(r => assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9))
        }
      }
    }
  }

  test("dedup exact: survivors count = distinct texts; idempotent") {
    forAll(Gen.listOfN(25, Gen.oneOf("t1", "t2", "t3", "t4 longer text"))) { texts =>
      whenever(texts.nonEmpty) {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val once = graft.ext.Dedup.exactDedup(df, "doc_id", "text")
        assert(once.count() === texts.distinct.size.toLong)
        assert(graft.ext.Dedup.exactDedup(once, "doc_id", "text").count()
          === once.count())
      }
    }
  }

  test("vector algebra: symmetry and Cauchy-Schwarz") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0)).map(_.toArray)
    forAll(vecGen, vecGen) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        graft.functions.Vectors.dot($"a", $"b"),
        graft.functions.Vectors.dot($"b", $"a"),
        graft.functions.Vectors.norm($"a"),
        graft.functions.Vectors.norm($"b")).collect().head
      assert(r.getDouble(0) === r.getDouble(1))
      assert(math.abs(r.getDouble(0)) <= r.getDouble(2) * r.getDouble(3) + 1e-9)
    }
  }

  test("connected components are a fixed point and respect edge locality") {
    forAll(Gen.listOfN(25,
        Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))) { edges =>
      val pairs = edges.filter { case (a, b) => a != b }
      whenever(pairs.nonEmpty) {
        val df = pairs.toDF("id_a", "id_b")
        val labels = graft.ext.Dedup.connectedComponents(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // every edge's endpoints share a component
        pairs.foreach { case (a, b) => assert(labels(a) === labels(b)) }
        // each component's label is its minimum member (canonical form)
        labels.groupBy(_._2).foreach { case (comp, members) =>
          assert(members.keys.min === comp)
        }
        // fixed point: re-running ON THE LABELS as pairs changes nothing
        val again = graft.ext.Dedup.connectedComponents(
            labels.toSeq.filter(kv => kv._1 != kv._2).toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        again.foreach { case (id, c) => assert(labels(id) === c || id == c) }
      }
    }
  }

  test("hash-sample fractions are monotone: keep-set grows with fraction") {
    val ids = spark.range(0, 2000).toDF("id")
    val fractions = Seq(0.01, 0.05, 0.2, 0.6, 1.0)
    val sets = fractions.map(f =>
      graft.ext.Sampling.hashSample(ids, "id", f, "law")
        .collect().map(_.getLong(0)).toSet)
    sets.sliding(2).foreach { case Seq(small, large) =>
      assert(small.subsetOf(large), "smaller fraction must nest in larger")
    }
  }

  // unique ids (index-assigned): the per-doc operators' contract
  private val textRows = Gen.listOfN(15,
    Gen.listOfN(12, Gen.oneOf("apple", "be", "cat!", "Δδ", "12",
      "zz@", " ", "")).map(_.mkString(" ")))
    .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("text-gate invariants on arbitrary text: entropy/surprisal/tfidf bounds") {
    samples(textRows, 4).foreach { data =>
      whenever(data.nonEmpty) {
        val df = data.toDF("doc_id", "text")
        // entropy in [0, ln 38] (37 alphabet symbols + other bucket)
        graft.ext.TextAnalysis.charEntropy(df, "doc_id", "text")
          .collect().foreach { r =>
            val e = r.getDouble(2)
            assert(e >= 0.0 && e <= math.log(38.0) + 1e-9, s"entropy $e")
          }
        // surprisal > 0 for docs with tokens; n_tokens positive
        graft.ext.TextAnalysis.unigramSurprisal(df, "doc_id", "text")
          .collect().foreach { r =>
            assert(r.getLong(1) > 0L && r.getDouble(2) > 0.0, r.toString)
          }
        // tfidf: rank bounded by k, scores non-negative, rank dense from 1
        val tf = graft.ext.TextAnalysis.tfidfTopTerms(df, "doc_id", "text", 3)
          .collect()
        tf.foreach { r =>
          assert(r.getInt(3) >= 1 && r.getInt(3) <= 3)
          assert(r.getDouble(2) >= 0.0)
        }
      }
    }
  }

  test("dup-span invariants on arbitrary text: coverage within [0, n_chars]") {
    samples(textRows, 4).foreach { data =>
      whenever(data.nonEmpty) {
        val df = data.toDF("doc_id", "text")
        graft.ext.Dedup.duplicatedSpanStats(df, "doc_id", "text", k = 5)
          .collect().foreach { r =>
            val n = if (r.isNullAt(1)) 0L else r.getInt(1).toLong
            val dup = r.getLong(3)
            assert(dup >= 0L && dup <= n, s"dup_chars $dup of $n")
            val frac = r.getDouble(4)
            assert(frac >= 0.0 && frac <= 1.0 + 1e-9, s"dup_frac $frac")
          }
      }
    }
  }

  test("weighted-sample law: n bound, subset of drawable rows, key-deterministic") {
    samples(Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 10000L),
        Gen.chooseNum(-5.0, 50.0))), 4).foreach { data =>
      whenever(data.nonEmpty) {
        val df = data.toDF("id", "w")
        val out = graft.ext.Sampling.weightedSample(df, "id", "w", 10)
          .collect().map(_.getLong(0))
        val drawableKeys = data.filter(_._2 > 0).map(_._1).toSet
        assert(out.length <= 10)
        assert(out.toSet.subsetOf(drawableKeys))
        assert(out.length === math.min(10, drawableKeys.size))
      }
    }
  }

  test("mixture-plan law: kept weights realize exact target ratios, bottleneck exhausted") {
    samples(Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.chooseNum(1.0, 500.0))), 4).foreach { data =>
      val present = data.map(_._1).toSet
      whenever(present === Set("a", "b", "c")) {
        val df = data.toDF("g", "w")
        val plan = graft.ext.Sampling.mixturePlan(df, "g", "w",
            Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
          .collect().map(r => r.getString(0) ->
            ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
          .toMap
        plan.values.foreach { case (avail, _, frac, kept) =>
          assert(frac >= 0.0 && frac <= 1.0)
          // kept is rounded at 4 dp, so it may sit half a grid step
          // above the exact available weight of the exhausted group
          assert(kept <= avail + 5e-5, "cannot keep more than exists")
        }
        // ratios of kept weights == ratios of targets (up to rounding)
        val (ka, kb, kc) = (plan("a")._4, plan("b")._4, plan("c")._4)
        val t = ka + kb + kc
        assert(math.abs(ka / t - 0.5) < 1e-3, s"a share ${ka / t}")
        assert(math.abs(kb / t - 0.3) < 1e-3)
        assert(math.abs(kc / t - 0.2) < 1e-3)
        // the binding group is fully consumed
        assert(plan.values.exists { case (avail, _, frac, _) =>
          frac > 1.0 - 1e-6 }, s"no group exhausted: $plan")
      }
    }
  }

  test("cdc-chunk law: chunks conserve chars (dup_frac <= 1), dup iff shared") {
    val texts = Gen.listOfN(8, Gen.listOfN(25,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "")).map(_.mkString(" ")))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    samples(texts, 3).foreach { data =>
      whenever(data.nonEmpty) {
        val df = data.toDF("doc_id", "text")
        val out = graft.ext.Dedup.cdcChunkStats(df, "doc_id", "text",
            w = 8, avgChunk = 16)
          .collect().map(r => r.getLong(0) ->
            ((r.getInt(1).toLong, r.getLong(2), r.getLong(4), r.getDouble(5))))
          .toMap
        // every doc appears exactly once with sane, conserving stats
        assert(out.keySet === data.map(_._1).toSet)
        out.foreach { case (id, (nChars, nChunks, dupChars, frac)) =>
          assert(dupChars <= nChars, s"doc $id dup $dupChars > len $nChars")
          assert(frac >= 0.0 && frac <= 1.0)
          if (nChars > 0) assert(nChunks >= 1L)
        }
        // identical texts must be mutually fully duplicated
        data.groupBy(_._2).values.filter(_.size >= 2).foreach { grp =>
          grp.filter(_._2.nonEmpty).foreach { case (id, t) =>
            assert(out(id)._4 === 1.0,
              s"doc $id has an identical twin but dup_frac ${out(id)._4}")
          }
        }
      }
    }
  }

  test("bigram-surprisal law: non-negative, defined iff >= 2 tokens") {
    samples(Gen.listOfN(10, Gen.listOfN(6,
      Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" "))).map(
      _.zipWithIndex.map { case (t, i) => (i.toLong, t) }), 3).foreach { data =>
      whenever(data.nonEmpty) {
        val df = data.toDF("doc_id", "text")
        val out = graft.ext.TextAnalysis.bigramSurprisal(df, "doc_id", "text")
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
          .toMap
        assert(out.keySet === data.map(_._1).toSet) // all docs have 6 tokens
        out.values.foreach { case (n, s) =>
          assert(n === 5L) // 6 tokens -> 5 bigrams
          assert(s >= 0.0, s"surprisal $s negative")
        }
      }
    }
  }

  test("shuffle-shard law: every row lands in exactly one shard, pos dense") {
    samples(Gen.chooseNum(1, 9), 4).foreach { n =>
      val rows = spark.range(0, 300).toDF("id")
      val out = graft.ext.Sampling.shuffleShards(rows, "id", n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(out.length === 300)
      assert(out.map(_._2).forall(s => s >= 0 && s < n))
      out.groupBy(_._2).values.foreach { grp =>
        assert(grp.map(_._3).sorted.toSeq === (1 to grp.size))
      }
    }
  }

  test("binaryMetrics AUC law: matches the O(n²) pair-counting " +
      "definition (ties = half credit) on arbitrary scored data") {
    val scored = Gen.listOfN(60, Gen.zip(
      Gen.oneOf(0, 1),
      // coarse grid FORCES tied scores across and within classes
      Gen.chooseNum(-3, 3).map(_ / 2.0)))
    forAll(scored) { data =>
      val pos = data.filter(_._1 == 1).map(_._2)
      val neg = data.filter(_._1 == 0).map(_._2)
      whenever(pos.nonEmpty && neg.nonEmpty) {
        val naive = pos.flatMap(p => neg.map(n =>
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0)).sum /
          (pos.size.toLong * neg.size)
        val got = graft.ext.Training.binaryMetrics(
            data.toDF("label", "score"), "label", "score")
          .collect().head.getAs[Double]("auc")
        assert(math.abs(got - naive) < 1e-12,
          s"rank AUC $got != pair AUC $naive on $data")
      }
    }
  }

}
