package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** fastText-style hashed-n-gram linear scoring — the inference half of
  * the learned quality classifier modern curation stacks (CCNet,
  * FineWeb practice) run as their MAIN quality filter. Training happens
  * offline (it is a one-node logistic regression over hashed bags);
  * inference is ONE dot product per document between the document's
  * hashed n-gram bag and a weight vector, which makes it a map-side
  * codegen expression with zero shuffle — the cheapest possible gate to
  * run over 100 TB before any expensive dedup/LM scoring.
  *
  * Feature space: whitespace unigrams + adjacent-word bigrams (the
  * fastText `wordNgrams=2` default), each hashed into `weights.length`
  * buckets via the engine-universal md5-prefix hash (the same
  * `conv(substr(md5(x),1,8),16,10) % B` every oracle here replays —
  * xxhash-style seeds are not SQL-portable). Score = bias + mean of the
  * feature-bucket weights, accumulated IN FEATURE ORDER (all unigrams
  * left-to-right, then all bigrams) so a SQL oracle folding the same
  * ordered list reproduces the double bit-for-bit.
  *
  * The weight table rides `ctx.addReferenceObj` (the big-constant rule:
  * a 100k-bucket model inlined as literals would cost seconds of JIT
  * per plan); the hot loop is one compiled pass per document. Input is
  * expected pre-lowercased (compose with `lower(col)`) so case-folding
  * semantics stay the host engine's. Null text → null score.
  */
final case class HashedNgramScoreExpr(child: Expression,
                                      weights: Array[Double],
                                      bias: Double)
    extends UnaryExpression {

  require(weights.nonEmpty, "hashed_ngram_score: weights must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_ngram_score"

  override protected def nullSafeEval(input: Any): Any =
    HashedNgramScorer.score(input.asInstanceOf[UTF8String], weights, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val w = ctx.addReferenceObj("weights", weights, "double[]")
      // Double.toString round-trips exactly, so the literal re-parses
      // to the identical bias double in the generated Java
      s"${ev.value} = graft.functions.HashedNgramScorer.score($c, $w, ${bias}D);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashedNgramScoreExpr =
    copy(child = newChild)
}

/** The shared scoring loop (interpreted eval and generated Java both
  * call it — one implementation, one accumulation order). */
object HashedNgramScorer {

  private val Md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Bucket of one feature string: first 4 md5 bytes as an unsigned
    * 32-bit integer, mod `buckets` — exactly
    * `conv(substr(md5(f),1,8),16,10) % buckets` in Spark/DuckDB SQL. */
  def bucket(feature: String, buckets: Int): Int = {
    val d = Md5.get().digest(feature.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (u % buckets).toInt
  }

  /** bias + mean of feature-bucket weights over unigrams (in token
    * order) then bigrams (in token order); bias alone for a document
    * with no tokens. The explicit `[ \t\n\f\r]+` class == RE2 `\s`
    * (never Java `\s`, which adds U+000B — the CLAUDE.md tokenizer
    * rule). */
  def score(text: UTF8String, weights: Array[Double], bias: Double): Double = {
    val toks0 = text.toString.split("[ \t\n\f\r]+")
    // leading separator yields one empty token; drop empties
    val toks = toks0.filter(_.nonEmpty)
    val n = toks.length
    if (n == 0) return bias
    var sum = 0.0
    var i = 0
    while (i < n) { sum += weights(bucket(toks(i), weights.length)); i += 1 }
    i = 0
    while (i < n - 1) {
      sum += weights(bucket(toks(i) + " " + toks(i + 1), weights.length))
      i += 1
    }
    bias + sum / (2 * n - 1)
  }

  /** The scorer's feature stream as bucket ids — unigrams in token
    * order then adjacent bigrams in token order, duplicates kept (a
    * repeated token contributes once per occurrence, exactly as
    * [[score]] accumulates it). The trainer consumes THIS so training
    * and inference can never disagree on featurization; the spec pins
    * `score == bias + mean(w(featureBuckets))`. Empty/whitespace text
    * → empty array. */
  def featureBuckets(text: String, buckets: Int): Array[Int] = {
    val toks = text.split("[ \t\n\f\r]+").filter(_.nonEmpty)
    val n = toks.length
    if (n == 0) return Array.emptyIntArray
    val out = new Array[Int](2 * n - 1)
    var i = 0
    while (i < n) { out(i) = bucket(toks(i), buckets); i += 1 }
    i = 0
    while (i < n - 1) {
      out(n + i) = bucket(toks(i) + " " + toks(i + 1), buckets)
      i += 1
    }
    out
  }

  /** Deterministic demo weight table for oracle-checked runs: bucket b
    * gets (md5-uniform in [-1000, 1000]) / 1000 — regenerable by any
    * engine, 3-decimal values whose Double.toString re-parses exactly.
    * Real deployments pass their offline-trained weights instead. */
  def md5Weights(buckets: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until buckets).map { b =>
      val d = md.digest(s"w:$b".getBytes("UTF-8"))
      val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (u % 2001L - 1000L) / 1000.0
    }.toArray
  }
}

/** Column-API surface. */
object Classifier {
  /** Hashed-n-gram linear score of a (pre-lowercased) text column. */
  def hashedNgramScore(text: Column, weights: Array[Double],
                       bias: Double = 0.0): Column =
    Bridge.column(HashedNgramScoreExpr(Bridge.expression(text), weights, bias))
}
