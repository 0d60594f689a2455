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
}
