package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.HashedNgramScorer

/** In-engine training of the hashed-n-gram quality classifier — the
  * loop-closer for the inference path in
  * [[graft.functions.HashedNgramScoreExpr]]: the reference pipeline
  * family (CCNet/FineWeb practice) APPLIES a fastText-style linear
  * filter; this trains one, so a curation stack can produce the filter
  * from its own labeled sample and deploy it map-side in the same job.
  *
  * Model: logistic regression over the scorer's exact feature space —
  * hashed unigrams + adjacent bigrams, mean-normalized (x = bucket
  * occurrence count / (2n−1)), so the learned (weights, bias) plug
  * straight into `Classifier.hashedNgramScore` with NO translation
  * layer: score = margin, keep = margin > 0.
  *
  * Optimizer: L-BFGS (two-loop recursion, history 10) with Armijo
  * backtracking. First-order and diagonally-preconditioned descent
  * both fail HERE, not just converge slowly: mean normalization gives
  * a rare feature x_j = 1/m ≈ 0.005, so its decisive weight must reach
  * |w| ≈ m (hundreds), while any safely-damped step moves O(1) per
  * pass — measured twice on the sf0.01 board (plain GD at lr=10 and
  * Gershgorin-damped diagonal Newton both flatlined at the majority-
  * class prior). L-BFGS's curvature pairs rescale the step per
  * DIRECTION, reaching that weight scale in tens of iterations.
  *
  * Scale shape: one `treeAggregate` (depth 2) per function/gradient
  * evaluation, folding (loss, gradient) — buckets + 2 doubles,
  * constant width like the Misra-Gries shuffle; the line search costs
  * ~1–2 extra evaluations per iteration. Every evaluation is a pass
  * over the TRAINING SET, so the training set must be sample-sized,
  * never corpus-sized — the same discipline as
  * `exactQuantileThresholds`: inputs above `maxRows` THROW (caps-THROW
  * rule) and the caller feeds a fixed slice or a hash-sample.
  * Inference over the full corpus stays the zero-shuffle codegen
  * expression. Featurized examples persist once (MEMORY_AND_DISK) so
  * evaluations never re-tokenize; optimizer state (θ and the history
  * pairs) lives in driver arrays, not in a plan, so the
  * checkpoint-chain pathology (SCALE.md round 8c) cannot arise.
  *
  * Determinism: the captured-weights oracle pattern (q40/q110) only
  * needs the weights USED for scoring to be the weights EMITTED to the
  * oracle, so cross-partition float merge order is free to vary;
  * weights and bias are snapped to `roundTo` decimals at the end so
  * they replay as short SQL literals whose Double round-trip is exact.
  */
object Training {

  /** Trained model: weights/bias are already snapped to the literal
    * grid — pass them verbatim to both the scorer and the oracle.
    * `iterations` counts OUTER L-BFGS steps taken (≤ maxIter;
    * hitting the cap returns the best iterate — a capped model is
    * still a model, unlike a capped graph merge — with the residual
    * visible in `gradNorm`). */
  final case class TrainedLogReg(weights: Array[Double], bias: Double,
                                 nExamples: Long, finalLoss: Double,
                                 iterations: Int, gradNorm: Double)

  /** Train on (textCol, labelCol ∈ {0,1}); null text/label rows are
    * excluded (undefined under both gate and truth — the
    * thresholdSweep convention). Text is lowercased with Spark's
    * `lower` so featurization matches `classifierScores`' SQL path
    * byte-for-byte, not a JVM locale's idea of case folding. */
  def trainLogReg(df: DataFrame, textCol: String, labelCol: String,
                  buckets: Int = 1024, maxIter: Int = 100,
                  l2: Double = 1e-6, tol: Double = 1e-7,
                  roundTo: Int = 6, maxRows: Int = 2000000): TrainedLogReg = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    require(l2 >= 0.0, s"l2 must be >= 0, got $l2")
    require(tol > 0.0, s"tol must be > 0, got $tol")
    require(maxRows > 0, s"maxRows must be > 0, got $maxRows")
    val base = df
      .select(lower(col(textCol)).cast("string").as("t"),
        col(labelCol).cast("double").as("y"))
      .filter(col("t").isNotNull && col("y").isNotNull)
    val data = base.rdd
      .map(r => (HashedNgramScorer.featureBuckets(r.getString(0), buckets),
        r.getDouble(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = data.count()
      require(n > 0, "trainLogReg: empty training set")
      require(n <= maxRows,
        s"trainLogReg: training set has $n rows, above the $maxRows gate — " +
          "every optimizer evaluation is a full pass; train on a fixed " +
          "slice or a hash-sample, score the corpus with the codegen " +
          "expression")
      val dim = buckets + 1 // θ = weights ++ bias (last coordinate)
      val sc = df.sparkSession.sparkContext

      // One distributed pass: (mean logistic loss + L2, gradient).
      def evaluate(theta: Array[Double]): (Double, Array[Double]) = {
        val bt = sc.broadcast(theta)
        val (ls, g) = data.treeAggregate((0.0, new Array[Double](dim)))(
          seqOp = { case ((al, ag), (fs, y)) =>
            val th = bt.value
            val m = fs.length
            var margin = th(buckets)
            if (m > 0) {
              var s = 0.0
              var i = 0
              while (i < m) { s += th(fs(i)); i += 1 }
              margin += s / m
            }
            val p = 1.0 / (1.0 + math.exp(-margin))
            val gd = p - y
            if (m > 0) {
              val gm = gd / m
              var i = 0
              while (i < m) { ag(fs(i)) += gm; i += 1 }
            }
            ag(buckets) += gd
            val l =
              if (y > 0.5) -math.log(math.max(p, 1e-15))
              else -math.log(math.max(1.0 - p, 1e-15))
            (al + l, ag)
          },
          combOp = { case ((l1, g1), (l2s, g2)) =>
            var i = 0
            while (i < dim) { g1(i) += g2(i); i += 1 }
            (l1 + l2s, g1)
          },
          depth = 2)
        bt.destroy()
        val nd = n.toDouble
        var f = ls / nd
        var i = 0
        while (i < buckets) { // L2 on weights only, never the bias
          f += 0.5 * l2 * theta(i) * theta(i)
          g(i) = g(i) / nd + l2 * theta(i)
          i += 1
        }
        g(buckets) /= nd
        (f, g)
      }

      def dot(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0
        var i = 0
        while (i < dim) { s += a(i) * b(i); i += 1 }
        s
      }
      def norm2(a: Array[Double]): Double = math.sqrt(dot(a, a))

      val hist = 10
      val sHist = new Array[Array[Double]](hist)
      val yHist = new Array[Array[Double]](hist)
      val rhoHist = new Array[Double](hist)
      var nPairs = 0 // pairs stored, oldest dropped ring-style
      var head = 0   // next write slot

      var theta = new Array[Double](dim)
      var (f, g) = evaluate(theta)
      var iter = 0
      var done = norm2(g) < tol
      while (iter < maxIter && !done) {
        // two-loop recursion: d = −H·g
        val q = g.clone()
        val alpha = new Array[Double](hist)
        var k = nPairs - 1
        while (k >= 0) {
          val idx = (head - nPairs + k + 2 * hist) % hist
          val a = rhoHist(idx) * dot(sHist(idx), q)
          alpha(k) = a
          var i = 0
          while (i < dim) { q(i) -= a * yHist(idx)(i); i += 1 }
          k -= 1
        }
        if (nPairs > 0) { // γ = sᵀy/yᵀy scaling of the seed Hessian
          val idx = (head - 1 + hist) % hist
          val gamma = 1.0 / (rhoHist(idx) * dot(yHist(idx), yHist(idx)))
          var i = 0
          while (i < dim) { q(i) *= gamma; i += 1 }
        }
        k = 0
        while (k < nPairs) {
          val idx = (head - nPairs + k + 2 * hist) % hist
          val beta = rhoHist(idx) * dot(yHist(idx), q)
          var i = 0
          while (i < dim) { q(i) += (alpha(k) - beta) * sHist(idx)(i); i += 1 }
          k += 1
        }
        val d = q
        var i = 0
        while (i < dim) { d(i) = -d(i); i += 1 }
        var gd = dot(g, d)
        if (gd >= 0) { // not a descent direction (stale curvature): reset
          nPairs = 0
          var j = 0
          while (j < dim) { d(j) = -g(j); j += 1 }
          gd = dot(g, d)
        }
        // Armijo backtracking from t=1 (t=1/||g|| on the very first,
        // history-free step, where d = −g has no natural scale)
        var t = if (nPairs == 0) 1.0 / math.max(1.0, norm2(g)) else 1.0
        val c1 = 1e-4
        var accepted = false
        var fNew = f
        var gNew = g
        var thetaNew = theta
        var ls = 0
        while (!accepted && ls < 20) {
          val cand = new Array[Double](dim)
          var j = 0
          while (j < dim) { cand(j) = theta(j) + t * d(j); j += 1 }
          val (fc, gc) = evaluate(cand)
          if (fc <= f + c1 * t * gd) {
            accepted = true
            fNew = fc; gNew = gc; thetaNew = cand
          } else t *= 0.5
          ls += 1
        }
        if (!accepted) done = true // flat to machine precision: stop
        else {
          val s = new Array[Double](dim)
          val yv = new Array[Double](dim)
          var j = 0
          while (j < dim) {
            s(j) = thetaNew(j) - theta(j)
            yv(j) = gNew(j) - g(j)
            j += 1
          }
          val sy = dot(s, yv)
          if (sy > 1e-10) { // curvature condition, else skip the pair
            sHist(head) = s; yHist(head) = yv; rhoHist(head) = 1.0 / sy
            head = (head + 1) % hist
            if (nPairs < hist) nPairs += 1
          }
          theta = thetaNew; f = fNew; g = gNew
          iter += 1
          if (norm2(g) < tol) done = true
        }
      }

      def snap(x: Double): Double =
        BigDecimal(x).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      TrainedLogReg(theta.take(buckets).map(snap), snap(theta(buckets)),
        n, f, iter, norm2(g))
    } finally {
      data.unpersist(blocking = false)
      ()
    }
  }

  /** Deterministic fold assignment: md5 of the salted id, 60-bit
    * prefix, mod k — the shuffleShards hash family, replayable
    * verbatim in any SQL engine. */
  def foldColumn(id: org.apache.spark.sql.Column, k: Int,
                 salt: String = "cv"): org.apache.spark.sql.Column =
    pmod(graft.functions.Strings.md5SliceLong(
      concat(lit(s"$salt:"), id.cast("string")), 1, 15), lit(k.toLong))

  /** Seeded k-fold cross-validation of [[trainLogReg]]: train on the
    * k−1 complement of each fold, return the k models for the caller
    * to score the HELD-OUT folds — the eval loop a curation stack runs
    * to pick a filter without measuring it on its own training data.
    *
    * Folds come from [[foldColumn]] (a salted doc-id hash) unless
    * `foldCol` names a caller column. The hash fold is only honest on
    * a near-dup-free corpus: a near-copy of a training document landing
    * in the held-out fold inflates every metric exactly like q59's
    * doc-hash split leaks vs q133's — pass folds derived from
    * connected components (splitByComponent's cluster labels mod k)
    * when the sample hasn't been deduplicated.
    *
    * Scale: each training run inherits trainLogReg's sample-size gate
    * (maxRows THROWS), so the whole CV is k × a bounded job; scoring
    * the folds stays the zero-shuffle codegen expression. */
  def kFoldLogReg(df: DataFrame, idCol: String, textCol: String,
                  labelCol: String, k: Int, buckets: Int = 1024,
                  maxIter: Int = 100, salt: String = "cv",
                  foldCol: Option[String] = None,
                  maxRows: Int = 2000000): Seq[(Int, TrainedLogReg)] = {
    require(k >= 2, s"k must be >= 2, got $k")
    val fold = foldCol.map(col)
      .getOrElse(foldColumn(col(idCol), k, salt))
    val withFold = df.withColumn("__fold", fold)
    (0 until k).map { i =>
      i -> trainLogReg(withFold.filter(col("__fold") =!= i),
        textCol, labelCol, buckets = buckets, maxIter = maxIter,
        maxRows = maxRows)
    }
  }

  /** Rank-based AUC and accuracy of a scored, labeled frame, grouped
    * by `groupCols` (e.g. the CV fold). Engine-exact by construction:
    * rows group by the 1e-6-snapped score as an INTEGER key, the
    * tie-averaged positive rank sum folds as the integer
    * S2 = Σ p·(2·cumBefore + c + 1) (= 2× the average-rank sum), and
    * AUC = (S2 − npos·(npos+1)) / (2·npos·nneg) is ONE division of
    * exact integers — IEEE correctly rounded, so any engine replaying
    * the same integers emits the identical double, no snap needed.
    * Accuracy likewise (pred = RAW score > 0, the classifierScores
    * convention). Null score/label rows are excluded (undefined under
    * both gate and truth). AUC is null when a group is single-class.
    *
    * Scale: one partial-agg shuffle to (group, snapped score) — ~1e6
    * distinct snapped scores max per group regardless of corpus size —
    * then a cumulative window per group over those DISTINCT scores
    * (explicit rowsBetween: running sums over duplicate sort keys must
    * never share a frame), then the per-group fold. */
  def binaryMetrics(df: DataFrame, label: String, rawScore: String,
                    groupCols: Seq[String] = Nil): DataFrame = {
    val gcols = groupCols.map(col)
    val sKey = floor(col(rawScore) * lit(1e6) + lit(0.5)).cast("long")
    val perScore = df
      .filter(col(rawScore).isNotNull && col(label).isNotNull)
      .select(gcols ++ Seq(
        sKey.as("__s"),
        col(label).cast("long").as("__y"),
        (col(rawScore) > 0).cast("long").as("__pred")): _*)
      .groupBy((gcols :+ col("__s")): _*)
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__p"),
        sum((col("__pred") === col("__y")).cast("long")).as("__corr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("__s").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = perScore.withColumn("__cum",
        coalesce(sum(col("__c")).over(w), lit(0L)))
      .withColumn("__s2",
        col("__p") * (lit(2L) * col("__cum") + col("__c") + lit(1L)))
    ranked.groupBy(gcols: _*)
      .agg(sum(col("__c")).as("n"), sum(col("__p")).as("n_pos"),
        sum(col("__s2")).as("__s2sum"), sum(col("__corr")).as("__ncorr"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_pos") < col("n"),
          (col("__s2sum") - col("n_pos") * (col("n_pos") + lit(1L)))
            .cast("double") /
            (lit(2L) * col("n_pos") * (col("n") - col("n_pos")))
              .cast("double")))
      .withColumn("accuracy",
        col("__ncorr").cast("double") / col("n").cast("double"))
      .drop("__s2sum", "__ncorr")
  }
}
