package graft.ext

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("distinctiveTerms: planted skew ranks first, shared terms don't") {
    // two groups share a uniform background vocabulary; group A is
    // salted with "alpha", group B with "beta". The log-odds z must
    // put the salt term at rank 1 of its own group and nowhere in the
    // other's top-k; the shared background terms score near zero.
    val bg = "the quick brown fox jumps over lazy dog"
    val rows =
      (0 until 30).map(i => (s"A", s"$bg alpha alpha")) ++
      (0 until 30).map(i => (s"B", s"$bg beta beta"))
    val df = rows.toDF("source", "text")
    val top = TextAnalysis.distinctiveTerms(df, "text", "source", topK = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(4)))
    val a1 = top.find { case (g, _, rk) => g == "A" && rk == 1 }.get
    val b1 = top.find { case (g, _, rk) => g == "B" && rk == 1 }.get
    assert(a1._2 === "alpha")
    assert(b1._2 === "beta")
    assert(!top.exists { case (g, t, _) => g == "A" && t == "beta" })
    assert(!top.exists { case (g, t, _) => g == "B" && t == "alpha" })
  }

  test("distinctiveTerms: every group gets <= topK rows, counts exact") {
    val df = Seq(
      ("A", "x x y"), ("A", "x z"), ("B", "y y z"), ("B", null)
    ).toDF("source", "text")
    val out = TextAnalysis.distinctiveTerms(df, "text", "source", topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byG = out.groupBy(_._1)
    assert(byG.forall(_._2.length <= 2))
    // exact per-group term counts survive the scoring chain
    assert(out.find(t => t._1 == "A" && t._2 == "x").forall(_._3 === 3L))
  }

  test("token counts: whitespace vs bpe-ish vs chars") {
    val df = Seq((1L, "Hello world, it's 42 degrees!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df, "doc_id", "text").collect().head
    assert(r.getInt(1) === 5)            // ws tokens
    // bpe-ish on lowercase: hello|world|,|it|'|s|42|degrees|! = 9
    assert(r.getInt(2) === 9)
    assert(r.getInt(3) === 29)
  }

  test("quality: clean prose beats punctuation soup; empty text safe") {
    val df = Seq(
      (1L, "the cat sat on the mat and it was a good day for all of us"),
      (2L, "!!! ### $$$ %%% ^^^ &&& *** ((( )))"),
      (3L, "")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.qualityScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(m(1L) > m(2L))
    assert(m(3L) >= 0.0 && m(3L) <= 1.0)
  }

  test("language id detects real sentences per language") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then the cat is with them in the house"),
      (2L, "el gato que vive en la casa de los vecinos es muy bonito y siempre come con una cuchara"),
      (3L, "der hund und die katze sind ein schönes paar und sie gehen nicht in das kino der stadt"),
      (4L, "le chien et les chats de la maison que nous avons est une belle chose pour nous tous"),
      (5L, "这是一个中文句子用来测试语言识别功能是否正确工作")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "zh"))
  }

  test("vocabulary: occurrences vs doc frequency, threshold prunes") {
    val df = Seq(
      (1L, "spark spark flink"),
      (2L, "spark beam")
    ).toDF("doc_id", "text")
    val v = TextAnalysis.vocabularyDF(df, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v("spark") === ((3L, 2L))) // 3 occurrences in 2 docs
    assert(v("flink") === ((1L, 1L)))
    val thresholded = TextAnalysis.vocabularyDF(df, "doc_id", "text", minCount = 2)
      .collect().map(_.getString(0))
    assert(thresholded === Array("spark"))
  }

  test("fingerprint: deterministic, order-sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "delta gamma beta alpha")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
    assert(fp.values.forall(v => v >= 0 && v < 2147483647L))
  }

  test("cleanText scrubs URLs and emails, collapses whitespace") {
    val df = Seq(
      (1L, "see https://example.com/a?b=1 and  mail bob@corp.io  now"),
      (2L, "no noise here"),
      (3L, "http://x.y z@w.org https://q.r/s")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.cleanText(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) === ((1, 1, "see and mail now")))
    assert(out(2L) === ((0, 0, "no noise here")))
    assert(out(3L) === ((2, 1, "")))
  }

  test("ngramStats counts bigram occurrences and doc frequency") {
    val df = Seq(
      (1L, "a b a b c"),   // "a b"×2, "b a"×1, "b c"×1
      (2L, "a b"),         // "a b"×1
      (3L, "solo")         // shorter than n → no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramStats(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a b") === ((3L, 2L)))
    assert(out("b a") === ((1L, 1L)))
    assert(out("b c") === ((1L, 1L)))
    assert(out.size === 3)
  }

  test("ngramStats with n=1 agrees with vocabularyDF") {
    val df = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val uni = TextAnalysis.ngramStats(df, "doc_id", "text", n = 1, minCount = 10L)
      .withColumnRenamed("ngram", "tok")
    val vocab = TextAnalysis.vocabularyDF(df, "doc_id", "text", minCount = 10L)
    assert(uni.except(vocab).count() === 0L)
    assert(vocab.except(uni).count() === 0L)
  }

  test("shardByTokenBudget: consecutive shards, budget respected at starts") {
    // 4 docs of 3 tokens each, budget 5: shard = floor(preceding/5)
    // preceding = 0, 3, 6, 9 -> shards 0, 0, 1, 1
    val df = Seq(
      (1L, "a b c", "en"), (2L, "d e f", "en"),
      (3L, "g h i", "en"), (4L, "j k l", "en"),
      (10L, "x y", "de")
    ).toDF("doc_id", "text", "lang")
    val s = graft.ext.TextAnalysis
      .shardByTokenBudget(df, "doc_id", "text", "lang", 5L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(s(1L) === 0L && s(2L) === 0L)
    assert(s(3L) === 1L && s(4L) === 1L)
    assert(s(10L) === 0L) // each lang shards independently
  }

  test("bpeTrain reproduces the classic merge sequence, deterministically") {
    val df = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, "doc_id", "text", numMerges = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    // pairs (l,o) and (o,w) tie at 5; lexicographic tiebreak -> (l,o)
    assert(merges(0) === ((0, "l", "o", 5L)))
    assert(merges(1) === ((1, "lo", "w", 5L)))
    assert(merges(2) === ((2, "low", TextAnalysis.EndOfWord, 3L)))
  }

  test("bpeInvariantSummary: violations zero, word/mass conservation") {
    val df = Seq((1L, "low low low lower lowest"),
                 (2L, "Lower LOWEST low")).toDF("doc_id", "text")
    val row = TextAnalysis.bpeInvariantSummary(df, "doc_id", "text", 3)
      .collect().head
    val m = row.schema.fieldNames.zip(row.toSeq).toMap
    assert(m("n_merges") === 3L)
    assert(m("rank_violations") === 0L)
    assert(m("score_violations") === 0L)
    assert(m("concat_violations") === 0L)
    assert(m("vocab_size_minus_base") === 3L)
    assert(m("vocab_violations") === 0L)
    assert(m("n_words") === 8L) // one end-of-word token per input word
    // mass = codepoints of lowered split words: 3+3+3+5+6 + 5+6+3
    assert(m("token_mass") === 34L)
  }

  test("bpeEncode applies merges in rank order; unseen chars stay atomic") {
    val corpus = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(corpus, "doc_id", "text", 3)
    val enc = TextAnalysis.bpeEncode(
        Seq((10L, "low lowest zz"), (11L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"), "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // merges: l+o, lo+w, low+EndOfWord
    assert(enc(10L) === Seq(
      ("low" + TextAnalysis.EndOfWord),                          // fully merged
      "low", "e", "s", "t", TextAnalysis.EndOfWord,       // prefix merged, tail atomic
      "z", "z", TextAnalysis.EndOfWord))                  // unseen word -> chars
    assert(enc(11L) === Seq.empty)        // null text -> no tokens
  }

  test("bpeFertilityByLang: encode fold matches training state, marker accounting") {
    val df = Seq(
      (1L, "low low low lower lowest", "en"),
      (2L, "low low", "de")).toDF("doc_id", "text", "lang")
    // union corpus: freq(low)=5 -> merges (l,o), (lo,w), (low,</w>)
    val merges = TextAnalysis.bpeTrain(df, "doc_id", "text", 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = TextAnalysis.bpeFertilityByLang(df, "text", "lang", merges)
      .collect().map(r => r.getString(0) -> r).toMap
    val en = out("en")
    // en: low x3 (1 token each), lower = low|e|r|</w> (4), lowest =
    // low|e|s|t|</w> (5) — the </w> marker rides the token count
    assert(en.getAs[Long]("n_words") === 5L)
    assert(en.getAs[Long]("n_distinct_words") === 3L)
    assert(en.getAs[Long]("n_chars") === 20L)
    assert(en.getAs[Long]("n_tokens") === 12L)
    assert(en.getAs[Double]("fertility") ===
      math.floor(12.0 / 5 * 1e6 + 0.5) / 1e6)
    assert(en.getAs[Double]("chars_per_token") ===
      math.floor(20.0 / 12 * 1e6 + 0.5) / 1e6)
    // de: both words fully merge to the single low</w> token — the
    // SAME distinct-word encode serves both language rows
    val de = out("de")
    assert(de.getAs[Long]("n_words") === 2L)
    assert(de.getAs[Long]("n_distinct_words") === 1L)
    assert(de.getAs[Long]("n_tokens") === 2L)
    assert(de.getAs[Double]("fertility") === 1.0)
  }

  test("packGreedy: zero-token doc cannot share a pack with an oversize doc") {
    val df = Seq(
      (1L, "", "en"),                       // 0 tokens
      (2L, "a b c d e f g h", "en"),        // 8 > budget 5 -> OWN pack
      (3L, "x y", "en")
    ).toDF("doc_id", "text", "lang")
    val out = graft.ext.TextAnalysis.packGreedy(df, "doc_id", "text", "lang", 5L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(1L) === 0L)
    assert(out(2L) === 1L) // oversize isolated even after a 0-token doc
    assert(out(3L) === 2L)
  }

  test("bpe handles non-BMP codepoints as whole symbols") {
    val df = Seq((1L, "x𝄞 x𝄞")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, "doc_id", "text", 1)
      .collect()
    assert(merges.length === 1)
    // the pair is (x, 𝄞) — the surrogate PAIR stays one valid symbol
    assert(merges.head.getString(2) === "𝄞")
    assert(merges.head.getString(3) === "x𝄞")
  }

  test("bpe keeps grapheme clusters whole (combining mark, zwj emoji)") {
    // "e" + combining acute must be ONE symbol, not (e, U+0301)
    val accented = "cafe\u0301 cafe\u0301" // decomposed: e + combining acute
    val df = Seq((1L, accented)).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, "doc_id", "text", 1).collect()
    assert(merges.nonEmpty)
    // no merge operand may be a bare combining mark
    merges.foreach { m =>
      assert(m.getString(1) !== "́")
      assert(m.getString(2) !== "́")
    }
    // a ZWJ emoji family encodes as (family, marker) — one symbol + marker
    val fam = "👨‍👩‍👧"
    val enc = TextAnalysis.bpeEncode(
      Seq((1L, fam)).toDF("doc_id", "text"), "doc_id", "text",
      TextAnalysis.bpeTrain(df, "doc_id", "text", 1))
      .selectExpr("tokens").collect().head.getSeq[String](0)
    assert(enc === Seq(fam, TextAnalysis.EndOfWord))
  }

  test("batched BPE training is merge-for-merge equivalent to sequential") {
    def both(df: org.apache.spark.sql.DataFrame, n: Int) = {
      val words = TextAnalysis.wordFrequencies(df, "text")
      def render(m: org.apache.spark.sql.DataFrame) =
        m.orderBy("rank").collect().map(r => (r.getInt(0), r.getString(1),
          r.getString(2), r.getString(3), r.getLong(4))).toSeq
      (render(TextAnalysis.bpeTrainFromWordsBatched(words, n)),
        render(TextAnalysis.bpeTrainFromWordsSequential(words, n)))
    }
    // classic fixture: tightly CHAINED pairs (every merge interacts
    // with the next) — batching must degrade to one merge per round,
    // not diverge
    val classic = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val (cb, cs) = both(classic, 3)
    assert(cb === cs)
    // adversarial interaction: (x,a) and (a,b) tie at the top and
    // share a symbol; merging (a,b) creates (x,ab) which outranks
    // everything else — a naive top-B batch would pick (x,a) and
    // diverge from the sequential schedule
    val chained = Seq((1L, Seq.fill(10)("x a b").mkString(" ") +
      " " + Seq.fill(6)("c d").mkString(" "))).toDF("doc_id", "text")
    val (hb, hs) = both(chained, 4)
    assert(hb === hs)
    // the real corpus, deeper than the board's 4 merges
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val (rb, rs) = both(real, 10)
    assert(rb === rs)
  }

  test("batched BPE survives deep round counts (loop-state pin)") {
    // batchSize = 1 forces one merge per ROUND, so 18 merges = 18
    // pinned iterations — crossing the every-8th-round real
    // localCheckpoint twice and the ~17-link depth where a chained
    // checkpoint re-executes its history (SCALE.md round 8c). The
    // result must still be merge-for-merge the sequential schedule.
    val words = TextAnalysis.wordFrequencies(
      graft.io.Tables.documents(spark, "/root/testdata/sf0.001"), "text")
    val rounds = scala.collection.mutable.Buffer.empty[Int]
    def render(m: org.apache.spark.sql.DataFrame) =
      m.orderBy("rank").collect().map(r => (r.getInt(0), r.getString(1),
        r.getString(2), r.getString(3), r.getLong(4))).toSeq
    val deep = render(TextAnalysis.bpeTrainFromWordsBatched(
      words, numMerges = 18, batchSize = 1, onRound = rounds += _))
    assert(rounds.length === 18, "batchSize=1 must run one merge per round")
    assert(deep === render(
      TextAnalysis.bpeTrainFromWordsSequential(words, 18)))
  }

  test("batched BPE selects many disjoint merges in one round") {
    // 8 disjoint letter pairs with strictly decreasing counts, each
    // spread over two words with DISTINCT tail characters so the top
    // pairs strictly outrank every within-word neighbor (including the
    // end-of-word-marker pair): the whole batch fits one round (one
    // pair-count job instead of 8)
    val tails = "qrstuvwxyz012345"
    val text = (0 until 8).flatMap { i =>
      val p = "" + ('a' + 2 * i).toChar + ('a' + 2 * i + 1).toChar
      val f = 40 - 2 * i
      Seq.fill(f / 2)(p + tails(2 * i)) ++ Seq.fill(f / 2)(p + tails(2 * i + 1))
    }.mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val words = TextAnalysis.wordFrequencies(df, "text")
    val rounds = scala.collection.mutable.Buffer.empty[Int]
    val batched = TextAnalysis.bpeTrainFromWordsBatched(
        words, numMerges = 8, onRound = rounds += _)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(rounds.sum === 8)
    assert(rounds.length < 4,
      s"8 disjoint merges should need ~1 round, took ${rounds.length}")
    val seq = TextAnalysis.bpeTrainFromWordsSequential(words, 8)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(batched === seq)
  }

  test("bpeTrain stops early when no pair repeats") {
    val df = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // every adjacent pair occurs once -> nothing worth merging
    val merges = TextAnalysis.bpeTrain(df, "doc_id", "text", numMerges = 5)
    assert(merges.count() === 0L)
  }

  test("importanceWeights: target-like docs score positive and get oversampled") {
    // target corpus: distinctive "quantum" vocabulary; pool: half
    // quantum-like, half cooking — DSIR log-ratios must separate them
    // by sign, and the Gumbel draw over the log weights must
    // oversample the target-like half
    val target = Seq(
      (1001L, "quantum flux lattice entangle qubit"),
      (1002L, "quantum spin lattice decohere qubit"),
      (1003L, "flux qubit entangle quantum gate")
    ).toDF("doc_id", "text")
    val pool = (
      (1L to 10L).map(i => (i, s"quantum qubit lattice flux unique$i")) ++
      (11L to 20L).map(i => (i, s"braise shallot saffron crouton unique$i"))
    ).toDF("doc_id", "text")
    val w = TextAnalysis.importanceWeights(pool, target, pool, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(w.size === 20)
    (1L to 10L).foreach { i =>
      assert(w(i)._3 > 0.0 && w(i)._4 > 0.0,
        s"quantum doc $i must be target-like: ${w(i)}")
    }
    (11L to 20L).foreach { i =>
      assert(w(i)._3 < 0.0 && w(i)._4 < 0.0,
        s"cooking doc $i must be off-domain: ${w(i)}")
      assert(w(i)._2 >= 4L, s"cooking doc $i is mostly target-OOV: ${w(i)}")
    }
    // the per-token average is the sum over the token count
    w.values.foreach { case (n, _, lw, lr) =>
      assert(math.abs(lr - lw / n) < 2e-4, s"log_ratio = log_weight/n: $n $lw $lr")
    }
    // end-to-end: the resampling draw on the RAW log weight (the
    // paper's ∝ exp(log w) form) is dominated by the target-like half
    val weights = TextAnalysis.importanceWeights(
      pool, target, pool, "doc_id", "text")
    val drawn = Sampling.gumbelTopK(weights, "doc_id", "log_weight", n = 8)
      .collect().map(_.getLong(0))
    assert(drawn.count(_ <= 10L) >= 7,
      s"target-like docs must dominate the draw: ${drawn.mkString(",")}")
  }

  test("bpe rejects input containing the reserved end-of-word marker") {
    // U+FDD0 is a Unicode noncharacter — never valid interchange text.
    // A word carrying it would corrupt the word-boundary bookkeeping
    // (n_words / token_mass), so symbolization fails loud instead.
    val df = Seq((1L, s"ok ok bad${TextAnalysis.EndOfWord}word ok"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextAnalysis.bpeTrain(df, "doc_id", "text", numMerges = 1).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("U+FDD0"))))
  }

  test("q82 fixture supports the pinned merge count (oracle dependence guard)") {
    // The q82 oracle pins n_merges = vocab_size_minus_base = 4. That is
    // FIXTURE-DEPENDENT: bpeTrain legitimately stops early when the best
    // pair count drops below 2, and two distinct merges can concatenate
    // to the same string, shrinking the vocab growth. This guard fails
    // loudly (with the real counts) if the driver corpus ever stops
    // supporting the pins — so a red q82 means a code bug, not a sparse
    // corpus. Runs on sf0.01, the EXACT corpus the oracle board uses.
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.01")
    val table = TextAnalysis.bpeTrain(docs, "doc_id", "text", numMerges = 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(table.length === 4,
      s"corpus no longer supports 4 score>=2 merges: ${table.mkString(", ")}")
    assert(table.map(_._3).distinct.length === 4,
      s"merge concatenations collide: ${table.map(_._3).mkString(", ")}")
    assert(table.forall(_._4 >= 2))
  }

  test("packGreedy: budget never exceeded, packs tight, oversize isolated") {
    val df = Seq(
      (1L, "a b c", "en"),        // 3
      (2L, "d e", "en"),          // 2 -> pack 0 full at 5
      (3L, "f g h i", "en"),      // 4 -> pack 1
      (4L, "j k", "en"),          // 2 -> 4+2>5 -> pack 2
      (5L, "w x y z v u t s", "en"), // 8 > budget -> its own pack 3
      (6L, "m", "en"),            // -> pack 4 (5's pack is over budget)
      (10L, "p q r", "de")        // groups independent
    ).toDF("doc_id", "text", "lang")
    val out = graft.ext.TextAnalysis.packGreedy(df, "doc_id", "text", "lang", 5L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(1L) === 0L && out(2L) === 0L)
    assert(out(3L) === 1L)
    assert(out(4L) === 2L)
    assert(out(5L) === 3L)
    assert(out(6L) === 4L)
    assert(out(10L) === 0L)
  }

  test("packGreedy invariants hold on the real corpus") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val packed = graft.ext.TextAnalysis
      .packGreedy(docs, "doc_id", "text", "lang", 500L)
    val perPack = packed.groupBy("group", "pack")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("tok"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
    perPack.foreach { r =>
      // over budget only possible for a single oversize doc
      assert(r.getLong(2) <= 500L || r.getLong(3) === 1L,
        s"pack ${r.getString(0)}/${r.getLong(1)} overflows with ${r.getLong(3)} docs")
    }
    assert(packed.count() === docs.count()) // every doc packed exactly once
  }

  test("shardByTokenBudget: null text counts as zero tokens, doc kept") {
    val df = Seq(
      (1L, "a b c", "en"),
      (2L, null.asInstanceOf[String], "en"),
      (3L, "d e f", "en")
    ).toDF("doc_id", "text", "lang")
    val rows = graft.ext.TextAnalysis
      .shardByTokenBudget(df, "doc_id", "text", "lang", 5L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L)) // null doc not dropped
    assert(rows(2L)._1 === 0L)              // zero tokens, not NULL/-1
    // running total: 0, 3, 3 -> shards 0, 0, 0
    assert(rows.values.map(_._2).toSet === Set(0L))
  }

  test("boilerplate lines found by doc frequency; strip reassembles order") {
    val df = Seq(
      (1L, "SHARED HEADER\nunique one\nSHARED FOOTER"),
      (2L, "SHARED HEADER\nunique two first\nunique two second\nSHARED FOOTER"),
      (3L, "SHARED HEADER\nunique three\nSHARED FOOTER"),
      (4L, "SHARED HEADER\nSHARED FOOTER")  // all boilerplate
    ).toDF("doc_id", "text")
    val bp = TextAnalysis.boilerplateLines(df, "doc_id", "text", 3L)
    assert(bp.count() === 2L) // header + footer; unique lines below threshold
    val stripped = TextAnalysis.stripBoilerplate(df, "doc_id", "text", 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stripped(1L) === "unique one")
    assert(stripped(2L) === "unique two first\nunique two second") // order kept
    assert(stripped(3L) === "unique three")
    // all-boilerplate docs SURVIVE with empty text: output ids == input ids
    assert(stripped(4L) === "")
    assert(stripped.keySet === Set(1L, 2L, 3L, 4L))
  }

  test("qualityRules: each gate flips independently") {
    val longDoc = ("word " * 20).trim
    val df = Seq(
      (1L, longDoc),                         // passes everything
      (2L, "too short"),                     // fails ok_length (2 tokens)
      (3L, ("antidisestablishmentarianism " * 15).trim), // fails avg token len
      (4L, ("w!!! " * 20).trim)              // fails punct ratio
    ).toDF("doc_id", "text")
    val r = TextAnalysis.qualityRules(df, "doc_id", "text",
        minTokens = 5L, maxTokens = 1000L,
        minAvgTokenLen = 2.0, maxAvgTokenLen = 12.0, maxPunctRatio = 0.3)
      .collect().map(x => x.getLong(0) ->
        (x.getBoolean(1), x.getBoolean(2), x.getBoolean(3), x.getBoolean(4))).toMap
    assert(r(1L) === ((true, true, true, true)))
    assert(r(2L)._1 === false && r(2L)._4 === false)
    assert(r(3L)._2 === false && r(3L)._4 === false)
    assert(r(4L)._3 === false && r(4L)._4 === false)
  }

  test("domainQualityReport: failure counts per rule, null flags fail, block verdict") {
    val longDoc = ("word " * 20).trim
    val df = Seq(
      // domain "good": 3 passing pages
      (1L, "good", longDoc), (2L, "good", longDoc), (3L, "good", longDoc),
      // domain "spam": 1 pass, 2 fails, 1 unjudgeable
      (4L, "spam", longDoc),
      (5L, "spam", "too short"),
      (6L, "spam", ("w!!! " * 20).trim),
      (7L, "spam", null.asInstanceOf[String])
    ).toDF("doc_id", "source", "text")
    val flags = TextAnalysis.qualityRules(df, "doc_id", "text",
      minTokens = 5L, maxTokens = 1000L, minAvgTokenLen = 2.0,
      maxAvgTokenLen = 12.0, maxPunctRatio = 0.3,
      keepCols = Seq("source"))
    val out = TextAnalysis.domainQualityReport(flags, "source",
        Seq("ok_length", "ok_token_len", "ok_punct"), "keep",
        minKeepShare = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6), r.getInt(7)))).toMap
    assert(out("good") === ((3L, 0L, 0L, 0L, 3L, 1.0, 0)))
    // spam: 4 docs; fails — length: doc5 + null doc7 = 2 (doc7's NULL
    // flag counts as a failure); token_len: doc7 = 1; punct: doc6 = 1
    // (qualityRules maps null text to ratio 0.0 → ok_punct TRUE);
    // kept: doc4 only -> share 0.25 < 0.5 -> blocked
    assert(out("spam") === ((4L, 2L, 1L, 1L, 1L, 0.25, 1)),
      "a NULL verdict counts as a failure, and the domain blocks")
  }

  test("piiScrub redacts emails, ips, phones; counts per kind") {
    val df = Seq(
      (1L, "mail bob.smith+x@example.co.uk or alice@test.org today"),
      (2L, "server at 192.168.0.1 and 10.0.0.255 responded"),
      (3L, "call +1 (555) 123-4567 or 555.867.5309 now"),
      (4L, "no pii here at all")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getInt(2), x.getInt(3), x.getInt(4))).toMap
    assert(r(1L)._1 === "mail <EMAIL> or <EMAIL> today")
    assert(r(1L)._2 === 2)
    assert(r(2L)._1 === "server at <IP> and <IP> responded")
    assert(r(2L)._3 === 2)
    assert(r(3L)._1 === "call <PHONE> or <PHONE> now")
    assert(r(3L)._4 === 2)
    assert(r(4L) === (("no pii here at all", 0, 0, 0)))
  }

  test("piiScrub does not double-count digits inside a redacted ip") {
    val df = Seq((1L, "ip 10.20.30.40 only")).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(df, "doc_id", "text").collect().head
    assert(r.getString(1) === "ip <IP> only")
    assert(r.getInt(3) === 1) // one ip...
    assert(r.getInt(4) === 0) // ...and no phone carved out of its digits
  }

  test("repetitionStats: duplicate lines and top bigram, hand-computed") {
    // 4 non-empty lines, 'aa bb' twice -> dup_line_frac = (4-3)/4;
    // dup chars = one repeat copy of 'aa bb' (5) over 5+5+2+11=23 chars
    val doc1 = "aa bb\naa bb\ncc\ndd ee dd ee"
    val df = Seq((1L, doc1), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getString(4), x.getDouble(5)))
      .toMap
    assert(r(1L)._1 === 4L)
    assert(math.abs(r(1L)._2 - 0.25) < 1e-12)
    assert(math.abs(r(1L)._3 - 5.0 / 23.0) < 1e-12)
    // bigrams: 'aa bb'(2, from the two lines), 'bb aa'(1, across \n),
    // 'bb cc'(1), 'cc dd'(1), 'dd ee'(2), 'ee dd'(1) -> tie 2-2 broken
    // lexicographically: 'aa bb'; frac = 2*5 / 26 chars
    assert(r(1L)._4 === "aa bb")
    assert(math.abs(r(1L)._5 - 10.0 / doc1.length) < 1e-12)
    // single-token doc: no bigram, no dup lines
    assert(r(2L) === ((1L, 0.0, 0.0, "", 0.0)))
    // empty doc keeps a row of zeros
    assert(r(3L) === ((0L, 0.0, 0.0, "", 0.0)))
  }

  test("dedupLines keeps only each line's first (doc, pos) occurrence") {
    val df = Seq(
      (1L, "alpha\nshared line\nbeta"),
      (2L, "shared line\ngamma\nshared line"), // cross-doc AND in-doc dup
      (3L, "shared line")                       // all-duplicate doc
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "alpha\nshared line\nbeta") // first occurrence stays
    assert(out(2L) === "gamma")                    // both copies removed
    assert(out(3L) === "")                         // row survives, empty
  }

  test("dedupLines: a null-id keeper doc must not delete the line everywhere") {
    val df = Seq(
      (Some(1L), "shared line\nkeep me"),
      (None, "shared line\nnull doc line")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(df, "doc_id", "text")
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) -> r.getString(1))
      .toMap
    // null sorts first -> the null-id doc IS the keeper and keeps the
    // line; doc 1 keeps its unique line only
    assert(out(None) === "shared line\nnull doc line")
    assert(out(Some(1L)) === "keep me")
  }

  test("tfidfTopTerms ranks distinctive terms above ubiquitous ones") {
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry banana date")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getString(1), r.getDouble(2)))
      .toMap
    // N=3; df: apple 1, banana 3, cherry 2, date 1
    // doc 1: apple tf=2 -> 2*ln(3)=2.1972; banana idf=0 -> 0.0
    assert(out((1L, 1)) === ("apple", 2.1972))
    assert(out((1L, 2)) === ("banana", 0.0))
    // doc 3: date ln(3)=1.0986 beats cherry ln(1.5)=0.4055
    assert(out((3L, 1)) === ("date", 1.0986))
    assert(out((3L, 2)) === ("cherry", 0.4055))
    // doc 2 has only 2 terms; k bound respected everywhere
    assert(out.keys.count(_._1 == 2L) === 2)
  }

  test("tfidfTopTerms breaks score ties by ascending term") {
    val df = Seq(
      (1L, "zz aa"), // both unique to doc 1 with tf=1: tied scores
      (2L, "mm")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .filter($"doc_id" === 1L).orderBy("rank")
      .collect().map(_.getString(1))
    assert(r.toSeq === Seq("aa", "zz"))
  }

  test("charEntropy: degenerate text scores 0, uniform text scores ln(k)") {
    val df = Seq(
      (1L, "aaaa"),          // one symbol -> 0
      (2L, "abab"),          // two equal symbols -> ln 2
      (3L, "abcd"),          // four equal symbols -> ln 4
      (4L, "!!!!"),          // all "other" bucket -> one symbol -> 0
      (5L, "")               // empty -> 0 by convention
    ).toDF("doc_id", "text")
    val e = TextAnalysis.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(e(1L) === 0.0)
    assert(e(2L) === 0.6931) // round(ln 2, 4)
    assert(e(3L) === 1.3863) // round(ln 4, 4)
    assert(e(4L) === 0.0)
    assert(e(5L) === 0.0)
  }

  test("charEntropy: NULL text is NULL, not the single-symbol band") {
    val df = Seq((1L, null: String), (2L, "aaaa"), (3L, ""))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows(1L) === None)       // missing doc: no entropy claim at all
    assert(rows(2L) === Some(0.0))  // genuine single-symbol run
    assert(rows(3L) === Some(0.0))  // genuinely empty keeps the convention
  }

  test("charEntropy: natural text sits above templated junk") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa aaa")
    ).toDF("doc_id", "text")
    val e = TextAnalysis.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(e(1L) > 2.0, s"prose entropy ${e(1L)}")
    assert(e(2L) < 1.0, s"junk entropy ${e(2L)}")
  }

  test("unigramSurprisal matches the hand-computed add-one model") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=2 b=2 c=1, total=5, V=3 -> p(a)=p(b)=3/8, p(c)=2/8
    val s = TextAnalysis.unigramSurprisal(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(s(1L) === ((3L, 0.9808)))  // -ln(3/8)
    assert(s(2L) === ((2L, 1.1836))) // avg(-ln(3/8), -ln(2/8))
  }

  test("unigramSurprisal: rare-token docs score higher than template spam") {
    val spam = (1 to 20).map(i => (i.toLong, "click here to win now"))
    val rare = Seq((100L, "ephemeral quixotic zephyr"))
    val df = (spam ++ rare).toDF("doc_id", "text")
    val s = TextAnalysis.unigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(100L) > s(1L) + 1.0, s"rare ${s(100L)} vs spam ${s(1L)}")
  }

  test("chunkByTokens: overlapping windows cover every token exactly") {
    val toks = (1 to 10).map(i => s"t$i")
    val df = Seq(
      (1L, toks.mkString(" ")),     // 10 tokens, max 8 ov 4 -> 2 chunks
      (2L, "a b c"),                // fits in one window
      (3L, ""),                     // zero tokens: no chunks
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(df, "doc_id", "text",
        maxTokens = 8, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getString(3)))).toMap
    // chunking EMITS text: case must survive (counting ops fold, this
    // one must not)
    val cased = TextAnalysis.chunkByTokens(
        Seq((9L, "The CEO of IBM")).toDF("doc_id", "text"),
        "doc_id", "text", maxTokens = 8)
      .collect().map(_.getString(3))
    assert(cased.toSeq === Seq("The CEO of IBM"))
    // starts 1 and 5: [t1..t8], [t5..t10]; start 9 would add nothing new
    assert(out((1L, 1)) === ((8, toks.take(8).mkString(" "))))
    assert(out((1L, 2)) === ((6, toks.drop(4).mkString(" "))))
    assert(out((2L, 1)) === ((3, "a b c")))
    assert(out.keySet === Set((1L, 1), (1L, 2), (2L, 1)))
    // coverage: the union of chunk tokens is the doc, in order
    val covered = Seq(out((1L, 1))._2.split(" "), out((1L, 2))._2.split(" "))
      .flatten.distinct
    assert(covered === toks)
  }

  test("crossCorpusSurprisal: reference model scores target, OOV floors") {
    val ref = Seq((1L, "a a b")).toDF("doc_id", "text") // rc: a=2 b=1; V=2, total=3
    val tgt = Seq((10L, "a b"), (11L, "zz zz")).toDF("doc_id", "text")
    val s = TextAnalysis.crossCorpusSurprisal(tgt, ref, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // doc 10: -[ln((2+1)/5) + ln((1+1)/5)]/2 ; no OOV
    assert(s(10L) === ((2L, 0L, BigDecimal(
        -(math.log(3.0 / 5.0) + math.log(2.0 / 5.0)) / 2.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // doc 11: both tokens OOV -> floor 1/5 each
    assert(s(11L) === ((2L, 2L, BigDecimal(-math.log(1.0 / 5.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("crossCorpusSurprisal: target-dominant boilerplate cannot normalize itself") {
    // 20 copies of the same template dominate the TARGET; the reference
    // is clean prose. Self-scoring (unigramSurprisal on the target)
    // rates the template as normal; reference-scoring flags it.
    val template = "click here to win a prize now"
    val tgt = ((1 to 20).map(i => (i.toLong, template)) :+
      (100L, "the cat sat on the mat")).toDF("doc_id", "text")
    val ref = Seq(
      (1L, "the cat sat on the mat and the dog lay by the door"),
      (2L, "a quiet morning with tea and the cat by the window")
    ).toDF("doc_id", "text")
    val self = TextAnalysis.unigramSurprisal(tgt, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cross = TextAnalysis.crossCorpusSurprisal(tgt, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // self-scored: the template looks MORE normal than real prose
    assert(self(1L) < self(100L))
    // reference-scored: the template is flagged, prose is not
    assert(cross(1L) > cross(100L),
      s"template ${cross(1L)} must out-score prose ${cross(100L)}")
  }

  test("bigramSurprisal matches the hand-computed conditional model") {
    val df = Seq((1L, "a b a"), (2L, "b a"), (3L, "x"))
      .toDF("doc_id", "text")
    // unigram contexts: a=3 b=2 x=1, V=3; bigrams: "a b"=1, "b a"=2
    // doc1: -[ln((1+1)/(3+3)) + ln((2+1)/(2+3))]/2; doc2: -ln(3/5)
    val s = TextAnalysis.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(s(1L) === ((2L, BigDecimal(
        -(math.log(2.0 / 6.0) + math.log(3.0 / 5.0)) / 2.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(s(2L) === ((1L, BigDecimal(-math.log(3.0 / 5.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(!s.contains(3L), "a one-token doc has no bigrams")
  }

  test("bigramSurprisal: scrambled word order scores above natural order") {
    // same vocabulary, same unigram counts — only the ORDER differs;
    // the natural phrase repeats its bigrams, the scrambles don't
    val phrase = "the cat sat on the mat"
    val natural = (1 to 10).map(i => (i.toLong, phrase))
    val scrambled = Seq(
      (100L, "mat the on sat cat the"),
      (101L, "sat mat the cat on the"))
    val df = (natural ++ scrambled).toDF("doc_id", "text")
    val s = TextAnalysis.bigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(100L) > s(1L) && s(101L) > s(1L),
      s"scrambled ${s(100L)}/${s(101L)} vs natural ${s(1L)}")
  }

  test("bm25Scores matches a hand-rolled reference on a tiny corpus") {
    val df = Seq(
      (1L, "hash join hash table"),
      (2L, "sort merge join"),
      (3L, "window frame spec"),
      (4L, null.asInstanceOf[String]), // never tokenized: out of N/avgdl
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Scores(df, "doc_id", "text",
        Seq("hash", "join"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // reference: N = 3 scored docs, avgdl = (4 + 3 + 3) / 3
    val n = 3.0; val avgdl = 10.0 / 3.0; val k1 = 1.2; val b = 0.75
    def idf(dfT: Double) = math.log(1 + (n - dfT + 0.5) / (dfT + 0.5))
    def w(tf: Double, dl: Double) =
      tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    def snap(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out.keySet === Set(1L, 2L)) // doc 3 matches nothing
    assert(out(1L)._1 === 4L && out(1L)._2 === 2L)
    // df(hash) = 1 (doc 1 only), df(join) = 2 (docs 1 and 2)
    assert(out(1L)._3 === snap(idf(1) * w(2, 4) + idf(2) * w(1, 4)))
    assert(out(2L)._1 === 3L && out(2L)._2 === 1L)
    assert(out(2L)._3 === snap(idf(2) * w(1, 3)))
  }

  test("bm25 length normalization: same tf, longer doc scores lower") {
    val pad = Seq.fill(40)("filler").mkString(" ")
    val df = Seq(
      (1L, "hash hash short doc"),
      (2L, s"hash hash $pad")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Scores(df, "doc_id", "text", Seq("hash"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) > out(2L),
      s"short ${out(1L)} must beat long ${out(2L)} at equal tf")
  }

  test("min-shingle fingerprint blocks near-dups together") {
    val base = "one two three four five six seven eight nine ten eleven twelve"
    val df = Seq(
      (1L, base),
      (2L, base + " thirteen"),         // tail edit
      (3L, "totally different words entirely here now okay")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.minShingleFingerprint(df, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L)) // min over shared shingles survives the edit
    assert(fp(1L) !== fp(3L))
  }

  private def extractOne(html: String): String =
    TextAnalysis.htmlToText(Seq((1L, html)).toDF("doc_id", "html"),
      "doc_id", "html").collect().head.getString(1)

  test("htmlToText drops script/style CONTENT, not just the tags") {
    val html = "<body><script>var hostile = \"</p> 1 < 2\";</script>" +
      "<style>p { color: red; }</style><p>real prose</p></body>"
    assert(extractOne(html) === "real prose")
  }

  test("htmlToText strips comments and tags to spaces, collapses runs") {
    val html = "<!-- header\nspanning lines --><h1>Title</h1>\n\n<p>a\tb</p>"
    assert(extractOne(html) === "Title a b")
  }

  test("htmlToText decodes entities in order: &amp;lt; means literal &lt;") {
    assert(extractOne("<p>a &lt; b &amp;&amp; c &gt; d</p>") === "a < b && c > d")
    // the double-escape: &amp;lt; is the TEXT "&lt;", never "<"
    assert(extractOne("<p>&amp;lt;</p>") === "&lt;")
    assert(extractOne("<p>x&nbsp;&nbsp;y &quot;z&quot; &#39;w&apos;</p>")
      === "x y \"z\" 'w'")
  }

  test("htmlToText: unknown entities pass through; null stays null") {
    assert(extractOne("<p>&copy; 2026</p>") === "&copy; 2026")
    val rows = TextAnalysis.htmlToText(
      Seq((1L, Option.empty[String]), (2L, Some("<p></p>")))
        .toDF("doc_id", "html"), "doc_id", "html")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows(1L) === null)
    assert(rows(2L) === "")
  }

  test("termBlocklistStats: whole-word hits, phrase beats prefix word, null text null") {
    val docs = Seq(
      (1L, "the hash join was slow and the scan was slow too"),
      (2L, "hashing is not a hash hit here"),       // substring must not match
      (3L, "a hash join inside"),                   // phrase, not bare hash
      (4L, "Slow START but only one hit"),          // case-insensitive
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.termBlocklistStats(docs, "doc_id", "text",
        terms = Seq("slow", "hash join", "corrupt"), minHits = 2)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) === ((Some(3), Some(2), Some(1)))) // 2x slow + 1 phrase
    assert(out(2L) === ((Some(0), Some(0), Some(0))), "hashing/hash alone")
    assert(out(3L) === ((Some(1), Some(1), Some(0))), "phrase wins, below minHits")
    assert(out(4L) === ((Some(1), Some(1), Some(0))))
    assert(out(5L) === ((None, None, None)), "null text is unscorable")
    intercept[IllegalArgumentException] {
      TextAnalysis.termBlocklistStats(docs, "doc_id", "text", Seq("a.b"))
    }
  }
}
