package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** fastText-style hashed-n-gram linear scorer (HashedNgramScoreExpr):
  * "offline-trained" weights shipped into the codegen expression must
  * score separable planted classes correctly, agree between the
  * interpreted and codegen paths, and match a by-hand fold. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val B = 4096

  /** Hand-"trained" weights: +1 on the buckets of good tokens (and
    * their in-class bigrams), -1 on bad ones — the shape an offline
    * logistic regression produces for separable classes. */
  private def trained: Array[Double] = {
    val w = new Array[Double](B)
    val good = Seq("informative", "detailed", "accurate", "thorough",
      "informative detailed", "detailed accurate", "accurate thorough")
    val bad = Seq("click", "spam", "free", "winner",
      "click spam", "spam free", "free winner")
    good.foreach(f => w(HashedNgramScorer.bucket(f, B)) = 1.0)
    bad.foreach(f => w(HashedNgramScorer.bucket(f, B)) = -1.0)
    w
  }

  test("separable planted classes score on opposite sides of 0") {
    val docs = Seq(
      (1L, "informative detailed accurate thorough"),
      (2L, "click spam free winner"),
      (3L, "Informative Detailed Accurate Thorough") // case-folds to good
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis
      .classifierScores(docs, "doc_id", "text", trained)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getInt(3))).toMap
    // 4 unigrams + 3 bigrams, all weighted: mean = ±1
    assert(out(1L)._1 == 7L && out(1L)._2 == 1.0 && out(1L)._3 == 1)
    assert(out(2L)._1 == 7L && out(2L)._2 == -1.0 && out(2L)._3 == 0)
    assert(out(3L)._2 == 1.0, "scoring must case-fold via lower()")
  }

  test("score is bias + ordered mean; empty and null text behave") {
    val docs = Seq((1L, "informative junkword"), (2L, "   "), (3L, null))
      .toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis
      .classifierScores(docs, "doc_id", "text", trained, bias = 0.25)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    // 2 unigrams (+1, 0) + 1 bigram (0) → 0.25 + 1/3
    assert(out(1L)._2.get.asInstanceOf[Double] === 0.25 + 1.0 / 3)
    // whitespace-only: zero features, score = bias, keep decided on it
    assert(out(2L) === ((Some(0L), Some(0.25), Some(1))))
    // null text: null score/keep/features
    assert(out(3L) === ((None, None, None)))
  }

  test("codegen path == interpreted scorer == by-hand fold") {
    val w = HashedNgramScorer.md5Weights(256)
    val text = "the quick brown fox jumps over the lazy dog"
    // by-hand: unigrams left-to-right then bigrams left-to-right
    val toks = text.split(" ")
    var expected = 0.0
    toks.foreach(t => expected += w(HashedNgramScorer.bucket(t, 256)))
    toks.sliding(2).foreach(p =>
      expected += w(HashedNgramScorer.bucket(p.mkString(" "), 256)))
    expected = -0.05 + expected / (2 * toks.length - 1)
    val interpreted = HashedNgramScorer.score(
      UTF8String.fromString(text), w, -0.05)
    assert(interpreted === expected)
    val viaPlan = Seq((1L, text)).toDF("doc_id", "text")
      .select(Classifier.hashedNgramScore(lower(col("text")), w, -0.05))
      .head.getDouble(0)
    assert(viaPlan === expected, "codegen must equal the interpreted fold")
  }

  test("thresholdSweep counts match a by-hand confusion matrix") {
    // scores 0.1..0.8 (snapped grid), truth = score >= 0.5 with two
    // deliberate disagreements (0.3 labeled true, 0.7 labeled false);
    // a null score and a null label row must be excluded everywhere.
    val df = Seq(
      (0.1, Some(false)), (0.2, Some(false)), (0.3, Some(true)),
      (0.4, Some(false)), (0.5, Some(true)), (0.6, Some(true)),
      (0.7, Some(false)), (0.8, Some(true)),
      (Double.NaN, None), (0.9, None)
    ).map { case (s, y) => (if (s.isNaN) None else Some(s), y) }
      .toDF("score", "label")
    val out = graft.ext.TextAnalysis
      .thresholdSweep(df, "score", "label", Seq(0.45, 0.75))
      .orderBy("threshold")
      .collect()
    assert(out.length === 2)
    val t045 = out(0)
    // >= 0.45: {0.5T, 0.6T, 0.7F, 0.8T} → tp=3 fp=1; below: 0.3T → fn=1, tn=3
    assert(t045.getAs[Long]("n") === 8L)
    assert((t045.getAs[Long]("tp"), t045.getAs[Long]("fp"),
      t045.getAs[Long]("fn"), t045.getAs[Long]("tn")) === ((3L, 1L, 1L, 3L)))
    assert(t045.getAs[Double]("precision") === 0.75)
    assert(t045.getAs[Double]("recall") === 0.75)
    assert(t045.getAs[Double]("f1") === 0.75)
    val t075 = out(1)
    // >= 0.75: {0.8T} → tp=1 fp=0; fn = {0.3, 0.5, 0.6} = 3
    assert((t075.getAs[Long]("tp"), t075.getAs[Long]("fp"),
      t075.getAs[Long]("fn"), t075.getAs[Long]("tn")) === ((1L, 0L, 3L, 4L)))
    assert(t075.getAs[Double]("precision") === 1.0)
    assert(t075.getAs[Double]("recall") ===
      math.floor(1.0 / 4.0 * 1e6 + 0.5) / 1e6)
  }

  test("thresholdSweep degenerate cuts: all-positive and all-negative") {
    val df = Seq((0.2, true), (0.4, false)).toDF("score", "label")
    val out = graft.ext.TextAnalysis
      .thresholdSweep(df, "score", "label", Seq(0.0, 1.0))
      .orderBy("threshold").collect()
    // t=0.0: everything predicted positive → fn=0, recall=1
    assert(out(0).getAs[Long]("fn") === 0L)
    assert(out(0).getAs[Double]("recall") === 1.0)
    // t=1.0: nothing predicted positive → tp+fp=0 → precision null,
    // recall 0, f1 null (p+r guard)
    assert(out(1).isNullAt(out(1).fieldIndex("precision")))
    assert(out(1).getAs[Double]("recall") === 0.0)
    assert(out(1).isNullAt(out(1).fieldIndex("f1")))
    intercept[IllegalArgumentException](graft.ext.TextAnalysis
      .thresholdSweep(df, "score", "label", Seq.empty))
    intercept[IllegalArgumentException](graft.ext.TextAnalysis
      .thresholdSweep(df, "score", "label", Seq(0.1, 0.1)))
  }

  /** Deterministic planted two-class corpus: disjoint token pools,
    * index-arithmetic word choice (no RNG — the repo's determinism
    * rule), so every run trains on byte-identical data. */
  private def plantedDocs(nPerClass: Int) = {
    val good = Array("informative", "detailed", "accurate", "thorough",
      "measured", "careful")
    val bad = Array("click", "spam", "free", "winner", "buy", "now")
    (0 until nPerClass).flatMap { i =>
      val g = (0 until 8).map(j => good((i * 7 + j * 3) % good.length))
        .mkString(" ")
      val b = (0 until 8).map(j => bad((i * 5 + j * 11) % bad.length))
        .mkString(" ")
      Seq((2L * i, g, 1), (2L * i + 1, b, 0))
    }.toDF("doc_id", "text", "label")
  }

  test("trainLogReg separates planted classes and composes with the sweep") {
    val docs = plantedDocs(100)
    val m = graft.ext.Training.trainLogReg(docs, "text", "label",
      buckets = 512, maxIter = 60)
    assert(m.nExamples === 200L)
    assert(m.finalLoss < 0.1, s"loss should collapse, got ${m.finalLoss}")
    // trained weights plug straight into the inference expression
    val scored = graft.ext.TextAnalysis
      .classifierScores(docs, "doc_id", "text", m.weights, m.bias)
      .join(docs.select(col("doc_id"), col("label")), Seq("doc_id"))
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Double]("score")))
    val goodScores = scored.filter(_._1 == 1).map(_._2)
    val badScores = scored.filter(_._1 == 0).map(_._2)
    // perfect separation (AUC = 1): every good above every bad, and
    // the sign itself classifies (keep = margin > 0)
    assert(goodScores.min > badScores.max)
    assert(goodScores.forall(_ > 0) && badScores.forall(_ < 0))
    // the q140 operating-point report over the trained scorer
    val sweep = graft.ext.TextAnalysis.thresholdSweep(
        graft.ext.TextAnalysis
          .classifierScores(docs, "doc_id", "text", m.weights, m.bias)
          .select(col("doc_id"),
            Rounding.reprRound6(col("score")).as("score"))
          .join(docs.select(col("doc_id"),
            (col("label") === 1).as("truth")), Seq("doc_id")),
        "score", "truth", Seq(0.0))
      .collect().head
    assert(sweep.getAs[Double]("precision") === 1.0)
    assert(sweep.getAs[Double]("recall") === 1.0)
    assert(sweep.getAs[Double]("f1") === 1.0)
  }

  test("featureBuckets is exactly the scorer's feature stream") {
    val w = HashedNgramScorer.md5Weights(256)
    for (text <- Seq("the quick brown fox", "one", "", "a a a b",
        "informative detailed accurate")) {
      val fs = HashedNgramScorer.featureBuckets(text, 256)
      val expect =
        if (fs.isEmpty) 0.125
        else 0.125 + fs.map(w).sum / fs.length
      assert(HashedNgramScorer.score(
        UTF8String.fromString(text), w, 0.125) === expect,
        s"text '$text'")
    }
  }

  test("trainLogReg gates: empty input and oversized input throw") {
    val empty = Seq.empty[(Long, String, Int)].toDF("doc_id", "text", "label")
    val ex1 = intercept[IllegalArgumentException](
      graft.ext.Training.trainLogReg(empty, "text", "label", maxIter = 1))
    assert(ex1.getMessage.contains("empty"))
    val two = Seq((1L, "a b", 1), (2L, "c d", 0)).toDF("doc_id", "text", "label")
    val ex2 = intercept[IllegalArgumentException](
      graft.ext.Training.trainLogReg(two, "text", "label", maxIter = 1,
        maxRows = 1))
    assert(ex2.getMessage.contains("gate"))
  }

  test("bucket matches the SQL-portable md5-prefix hash") {
    // conv(substr(md5(x),1,8),16,10) % B replayed in Scala
    val md = java.security.MessageDigest.getInstance("MD5")
    for (s <- Seq("hello", "hello world", "统一", "")) {
      val hex = md.digest(s.getBytes("UTF-8")).take(4)
        .map(b => f"$b%02x").mkString
      val expect = (java.lang.Long.parseLong(hex, 16) % B).toInt
      assert(HashedNgramScorer.bucket(s, B) === expect, s"feature '$s'")
    }
  }

  test("binaryMetrics: AUC and accuracy match a by-hand computation, " +
      "ties averaged, single-class group → null AUC") {
    // scores chosen with a TIE straddling the classes: labels/scores
    // (1, .9) (1, .5) (0, .5) (0, .1) — ranks asc: .1→1, {.5,.5}→2.5,
    // .9→4; sumRankPos = 4 + 2.5 = 6.5; AUC = (6.5 − 3)/(2·2) = 0.875.
    // preds (raw > 0) are all 1 → accuracy = 2/4.
    val df = Seq((1, 0.9), (1, 0.5), (0, 0.5), (0, 0.1))
      .toDF("label", "score")
    val r = graft.ext.Training.binaryMetrics(df, "label", "score")
      .collect().head
    assert(r.getAs[Long]("n") === 4L && r.getAs[Long]("n_pos") === 2L)
    assert(r.getAs[Double]("auc") === 0.875)
    assert(r.getAs[Double]("accuracy") === 0.5)
    // negative scores predict 0: perfect separation → AUC 1, acc 1
    val sep = Seq((1, 2.0), (1, 0.5), (0, -0.5), (0, -2.0))
      .toDF("label", "score")
    val r2 = graft.ext.Training.binaryMetrics(sep, "label", "score")
      .collect().head
    assert(r2.getAs[Double]("auc") === 1.0)
    assert(r2.getAs[Double]("accuracy") === 1.0)
    // single-class group: AUC undefined, accuracy still defined
    val one = Seq((1, 0.4), (1, -0.2)).toDF("label", "score")
    val r3 = graft.ext.Training.binaryMetrics(one, "label", "score")
      .collect().head
    assert(r3.isNullAt(r3.fieldIndex("auc")))
    assert(r3.getAs[Double]("accuracy") === 0.5)
    // grouped: each group folds independently
    val g = Seq(("a", 1, 0.9), ("a", 0, -0.9), ("b", 1, -0.3), ("b", 0, 0.3))
      .toDF("grp", "label", "score")
    val by = graft.ext.Training.binaryMetrics(g, "label", "score",
        groupCols = Seq("grp")).collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Double]("auc")).toMap
    assert(by("a") === 1.0 && by("b") === 0.0)
  }

  test("kFoldLogReg: folds partition the sample, every fold's model " +
      "separates the held-out docs (AUC 1 on separable classes)") {
    val docs = plantedDocs(60)
    val k = 3
    val models = graft.ext.Training.kFoldLogReg(docs, "doc_id", "text",
      "label", k = k, buckets = 512, maxIter = 60)
    assert(models.map(_._1) === (0 until k))
    // fold sizes: each model trained on strictly fewer than all rows,
    // and the three complements cover every row exactly k−1 times
    val total = docs.count()
    assert(models.forall(_._2.nExamples < total))
    assert(models.map(_._2.nExamples).sum === (k - 1) * total)
    // held-out scoring: each fold's model must separate ITS test fold
    val withFold = docs.withColumn("fold",
      graft.ext.Training.foldColumn(col("doc_id"), k))
    models.foreach { case (i, m) =>
      val scored = withFold.filter(col("fold") === i)
        .withColumn("score", graft.functions.Classifier.hashedNgramScore(
          lower(col("text")), m.weights, m.bias))
      val r = graft.ext.Training.binaryMetrics(scored, "label", "score")
        .collect().head
      assert(r.getAs[Double]("auc") === 1.0,
        s"fold $i must generalize to its held-out docs")
      assert(r.getAs[Long]("n") > 0L)
    }
  }
}
