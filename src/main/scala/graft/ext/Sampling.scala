package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus-shaping operators for
  * training-data pipelines (BASELINE.json extension surface; the
  * reference has no sampling of any kind).
  *
  * All sampling here is HASH-based, not RNG-based: membership is a pure
  * function of (salt, key), so a sample is reproducible across runs,
  * engines, partitionings, and retries — the property that matters when
  * a 100 TB corpus is sampled incrementally (yesterday's sample stays
  * valid as new files arrive) or audited post-hoc. Spark's native
  * `df.sample` is per-partition RNG: cheap but irreproducible under
  * repartitioning and inexpressible in an oracle.
  *
  * Every operator is a map-side projection/filter — zero shuffle.
  */
object Sampling {

  /** Membership predicate: keep a row iff the first 4 hex digits of
    * md5(salt ++ key) fall below `fraction` of the 16^4 space. The
    * 1/65536 granularity is fine for corpus work; md5 is identical in
    * every engine (the DuckDB oracles run the same formula verbatim).
    */
  def sampleExpr(key: Column, fraction: Double, salt: String): Column = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    val bound = math.round(fraction * 65536.0).toInt
    if (bound >= 65536) lit(true)
    else if (bound <= 0) lit(false)
    else substring(md5(concat(lit(salt), key.cast("string"))), 1, 4) <
      lit(f"$bound%04x")
  }

  /** Deterministic ~`fraction` sample keyed on `keyCol`. Different
    * `salt`s give independent samples over the same keys. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(sampleExpr(col(keyCol), fraction, salt))

  /** Per-stratum deterministic sampling: each `strataCol` value keeps
    * its own fraction (absent values keep `defaultFraction`). The
    * training-data use: downsample over-represented languages/sources
    * to a target mixture without shuffling anything.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 0.0,
                           salt: String = "graft"): DataFrame = {
    val keep = fractions.foldLeft(
      sampleExpr(col(keyCol), defaultFraction, salt)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum),
          sampleExpr(col(keyCol), f, salt)).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Adds a `split` column ('train' | 'test') by key hash: disjoint,
    * exhaustive, reproducible — the same key always lands in the same
    * split even across dataset versions. */
  def trainTestSplit(df: DataFrame, keyCol: String, testFraction: Double,
                     salt: String = "graft"): DataFrame = {
    requireFreeColumns(df, "trainTestSplit", "split")
    df.withColumn("split",
      when(sampleExpr(col(keyCol), testFraction, salt), lit("test"))
        .otherwise(lit("train")))
  }

  /** Leakage-safe train/test split: assign whole NEAR-DUP CLUSTERS to
    * a split, never individual documents. [[trainTestSplit]] hashes the
    * document key, so two near-duplicate documents (different keys,
    * ~same content) can land on opposite sides — and a test set that
    * contains near-copies of training documents silently inflates every
    * evaluation run on the model trained from it. Splitting on the
    * cluster label closes that channel: `components` is an
    * (id, component) frame — [[Dedup.connectedComponents]] over
    * minhash/simhash pairs — and the split hash is taken over
    * `coalesce(component, id)` (docs absent from the closure are their
    * own singleton clusters), so every member of a cluster shares one
    * draw by construction.
    *
    * Output = `df` + `cluster` (BIGINT) + `split` ('train' | 'test').
    *
    * Scale shape: one left equi-join of the corpus against the
    * docs-sized label frame (no wider than the exact-dedup join) plus
    * the same map-side md5 predicate as [[trainTestSplit]] — the
    * near-dup pair generation upstream dominates at any scale, and it
    * is the caller's (LSH-capped) problem. `keyCol` must be non-null:
    * a null key cannot be joined to its label (CLAUDE.md null-key
    * rule), so null-key rows are rejected loudly rather than silently
    * split at doc granularity.
    */
  def splitByComponent(df: DataFrame, keyCol: String, components: DataFrame,
                       testFraction: Double, salt: String = "graft")
      : DataFrame = {
    requireFreeColumns(df, "splitByComponent", "split")
    requireFreeColumns(df, "splitByComponent", "cluster")
    val labels = components
      .select(col("id").as(keyCol), col("component").as("cluster"))
    df.join(labels, Seq(keyCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(keyCol)))
      .withColumn("split",
        when(col(keyCol).isNull,
          raise_error(lit("splitByComponent: null key — a null id has " +
            "no cluster label and would silently fall back to " +
            "doc-granular splitting; assign ids upstream")))
          .when(sampleExpr(col("cluster"), testFraction, salt), lit("test"))
          .otherwise(lit("train")))
  }

  /** Keep at most `k` rows per group, chosen by `order` (caller supplies
    * deterministic tiebreaks). The standard "cap documents per domain"
    * pipeline op: one shuffle on the group key, rank, filter. At scale,
    * per-group state is O(1) per row in the window (running row_number),
    * not a per-group materialization.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String],
                  order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Mixture rebalancing plan: given target proportions per group
    * (language, source, domain), compute the per-group keep fractions
    * that realize the LARGEST corpus with exactly the target mixture —
    * the planning step before every "rebalance the training mix" job.
    *
    * The bottleneck rule: the achievable total is
    * T = min over targeted groups of available_g / target_g (the group
    * whose supply runs out first caps everything), and each group then
    * keeps target_g · T / available_g of its weight. Groups absent from
    * `targets` get fraction 0 (dropped from the mix) — pass them
    * explicitly to keep them. A targeted group with NO corpus supply
    * makes the mixture infeasible (T = 0): it gets its OWN output row
    * with `available` 0 and NULL keep_frac/kept — the caller sees
    * exactly WHICH group is short — and every supplied group keeps 0,
    * so nothing can be silently sampled at a skewed mix. Output per
    * group: `available` (current weight), `target_share`, `keep_frac`
    * (6 dp, the input [[stratifiedHashSample]] wants), `kept` (weight
    * retained, 4 dp).
    *
    * Scale shape: one partial-aggregated groupBy over the corpus (the
    * weight totals), then the group-count-sized plan table computes the
    * bottleneck via a one-row broadcast min — the corpus is scanned
    * once and never shuffled beyond the group agg. Deterministic: the
    * only float ops are ·,/ (correctly-rounded IEEE), so a SQL oracle
    * replays the plan exactly.
    */
  def mixturePlan(df: DataFrame, groupCol: String, weightCol: String,
                  targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "at least one target share")
    require(targets.values.forall(v => v > 0.0),
      s"target shares must be positive: $targets")
    val shareSum = targets.values.sum
    require(math.abs(shareSum - 1.0) < 1e-9,
      s"target shares must sum to 1, got $shareSum")
    val spark = df.sparkSession
    import spark.implicits._
    // the targets as a (tiny, driver-sized) table: a FULL OUTER against
    // the corpus totals gives a targeted-but-absent group its own row
    // (available 0) instead of silently dropping it from the report
    val tgt = targets.toSeq.toDF("__tg", "__ts")
    // group key CAST to string before meeting the string target keys:
    // an int/long group column would otherwise implicitly cast against
    // "en"-style targets, match nothing, and report an all-dropped plan
    // with no error (packGreedy's convention)
    val avail = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .groupBy(col(groupCol).cast("string").as("group"))
      .agg(sum(col(weightCol)).cast("double").as("available"))
      .join(broadcast(tgt), col("group") <=> col("__tg"), "full_outer")
      .select(coalesce(col("group"), col("__tg")).as("group"),
        coalesce(col("available"), lit(0.0)).as("available"),
        col("__ts").as("ts"))
    // the bottleneck total: min available/target over targeted groups.
    // A zero-supply targeted group contributes 0, so T = 0 and every
    // supplied group keeps nothing — infeasibility is self-enforcing.
    val bottleneck = avail.filter(col("ts").isNotNull)
      .agg(min(col("available") / col("ts")).as("t_max"))
    avail.crossJoin(broadcast(bottleneck))
      .select(col("group").as(groupCol),
        col("available"),
        coalesce(col("ts"), lit(0.0)).as("target_share"),
        // repr-robust snap, not round: Spark rounds the shortest
        // decimal repr, SQL engines the value — they flip at repr
        // half-points (the q95 class; graft.functions.Rounding)
        when(col("ts").isNull, lit(0.0))
          .when(col("available") === 0.0, lit(null).cast("double"))
          .otherwise(graft.functions.Rounding.reprRound6(
            col("ts") * col("t_max") / col("available"))).as("keep_frac"),
        when(col("ts").isNull, lit(0.0))
          .when(col("available") === 0.0, lit(null).cast("double"))
          .otherwise(graft.functions.Rounding.reprRound4(
            col("ts") * col("t_max"))).as("kept"))
  }

  /** UniMax-style token-budget allocation (Chung et al. 2023): where
    * [[mixturePlan]] realizes a CHOSEN mixture, this op answers the
    * prior question — with `totalBudget` tokens to spend and at most
    * `maxEpochs` passes over any group, how much does each group get?
    * Water-filling: every group's cap is `floor(tokens·maxEpochs)`;
    * budget pours equally into all groups, groups that hit their cap
    * saturate, and the overflow re-pours into the rest — the mixture
    * that maximizes low-resource share without over-repeating anyone.
    *
    * Entirely integer arithmetic, so a SQL oracle replays it exactly:
    * with caps sorted ascending (group name tiebreak), the saturated
    * set is the prefix where `cap_i·(n−i+1) + S_{i−1} ≤ B` (filling
    * every remaining group at level cap_i still fits; the left side is
    * nondecreasing in i, so the cut is well-defined); the rest receive
    * `λ = (B − S_k) div (n−k)` each, with the remainder distributed
    * +1 to the first `(B − S_k) mod (n−k)` of them in sort order.
    * Allocations sum to exactly min(B, Σcap) — no float drift to
    * reconcile. Products ride DECIMAL(38,0) (cap × group-count can
    * overflow Long at extreme budgets).
    *
    * Output per group: `tokens` available, `cap`, `alloc`, `saturated`
    * flag, and `epochs_used` = alloc/tokens (6 dp; NULL for an empty
    * group). Scale shape: ONE partial-aggregated groupBy over the
    * corpus; the waterfall itself runs at group cardinality (languages,
    * sources — small by nature), where the unpartitioned windows are
    * single-task by construction.
    */
  def tokenBudgetWaterfall(df: DataFrame, groupCol: String,
                           tokensCol: String, totalBudget: Long,
                           maxEpochs: Double): DataFrame = {
    require(totalBudget >= 0L, "totalBudget must be non-negative")
    require(maxEpochs > 0.0, "maxEpochs must be positive")
    val dec = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val snap6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val byGroup = df
      .groupBy(col(groupCol).cast("string").as("group"))
      .agg(coalesce(sum(col(tokensCol)), lit(0L)).cast("long").as("tokens"))
      .withColumn("cap",
        floor(col("tokens").cast("double") * lit(maxEpochs)).cast("long"))
    val ord = Window.orderBy(col("cap").asc, col("group").asc_nulls_last)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val b = lit(totalBudget)
    byGroup
      .withColumn("__rn", row_number().over(ord))
      .withColumn("__s", sum(col("cap")).over(run))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("__sat",
        (dec(col("cap")) * dec(col("__n") - col("__rn") + lit(1)) +
          dec(col("__s")) - dec(col("cap")) <= dec(b)).cast("int"))
      .withColumn("__k", sum(col("__sat")).over(all))
      .withColumn("__sk",
        coalesce(sum(when(col("__sat") === 1, col("cap"))).over(all),
          lit(0L)))
      .withColumn("alloc",
        when(col("__sat") === 1, col("cap")).otherwise(
          expr(s"(${totalBudget}L - __sk) DIV (__n - __k)") +
            when(col("__rn") - col("__k") <=
              expr(s"(${totalBudget}L - __sk) % (__n - __k)"),
              lit(1L)).otherwise(lit(0L))))
      .withColumn("epochs_used",
        when(col("tokens") > 0,
          snap6(col("alloc").cast("double") / col("tokens").cast("double"))))
      .select(col("group").as(groupCol), col("tokens"), col("cap"),
        col("alloc"), col("__sat").as("saturated"), col("epochs_used"))
  }

  /** Exact k-quantile bucket per row (`bucket` ∈ 1..k) via `ntile` over
    * a GLOBAL order. Correct and oracle-checkable, but the empty
    * partitionBy serializes the sort into one task — fine for
    * driver-sized tables, wrong for a 100 TB fact table; use
    * [[quantileBuckets]] there.
    */
  def ntileBuckets(df: DataFrame, valueCol: String, tiebreak: String,
                   k: Int): DataFrame = {
    requireFreeColumns(df, "ntileBuckets", "bucket")
    df.withColumn("bucket",
      ntile(k).over(Window.orderBy(col(valueCol).asc, col(tiebreak).asc)))
  }

  /** Scale path for quantile bucketing: thresholds from one
    * `approx_percentile` pass (t-digest sketch, fully distributed),
    * broadcast back as literals; assignment is a map-side comparison
    * chain. Bucket sizes are approximately equal (sketch accuracy), but
    * NO global sort ever happens — the shape that survives 100 TB.
    */
  def quantileBuckets(df: DataFrame, valueCol: String, k: Int,
                      accuracy: Int = 10000): DataFrame = {
    require(k > 1, "k must be > 1")
    requireFreeColumns(df, "quantileBuckets", "bucket")
    val probs = (1 until k).map(_.toDouble / k)
    val row = df.select(
      percentile_approx(col(valueCol),
        array(probs.map(lit): _*), lit(accuracy)).as("t"))
      .first()
    require(!row.isNullAt(0),
      s"cannot compute quantile thresholds: no non-null '$valueCol' values")
    bucketByThresholds(df, valueCol, row.getSeq[Any](0).map(_.toString.toDouble))
  }

  /** Exact k-quantile thresholds via linear interpolation at
    * p*(n-1) — the same definition as DuckDB/Postgres `quantile_cont`,
    * so an oracle replays them verbatim. Spark's exact `percentile`
    * aggregate is a genuine partial aggregation (per-partition
    * value→count maps, merged once) — no global sort, unlike `ntile`;
    * the final merge holds the DISTINCT values, so use it when the
    * value domain is bounded (prices, scores) and [[quantileBuckets]]
    * when it is not. Thresholds are rounded to `roundTo` decimals so
    * last-ulp interpolation differences between engines cannot flip a
    * boundary comparison.
    *
    * Scale gate: the final merge of exact `percentile` holds EVERY
    * distinct value in one aggregation buffer — at sf10 a full-orders
    * feed was the board's worst superlinear line (56 s, 9.4× for 10×
    * data). Inputs above `maxRows` THROW (the caps-THROW rule, not a
    * silent fallback): bound the input to a fixed slice (the q16 twin
    * convention) or use [[quantileBuckets]] (approx_percentile sketch,
    * constant-size buffer) for the corpus path. The gate's count is an
    * early-exit `limit(maxRows+1)` scan, not a full pass.
    */
  def exactQuantileThresholds(df: DataFrame, valueCol: String, k: Int,
                              roundTo: Int = 4,
                              maxRows: Int = 10000000): Seq[Double] = {
    require(k > 1, "k must be > 1")
    require(maxRows > 0, "maxRows must be > 0")
    val n = df.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"exactQuantileThresholds: input exceeds $maxRows rows — exact " +
        "percentile accumulates every distinct value into one buffer; " +
        "feed a fixed slice or use quantileBuckets (approx) at corpus scale")
    val probs = (1 until k).map(_.toDouble / k)
    val row = df.select(
      percentile(col(valueCol), array(probs.map(lit): _*)).as("t")).first()
    require(!row.isNullAt(0),
      s"cannot compute quantile thresholds: no non-null '$valueCol' values")
    row.getSeq[Any](0).map(v =>
      BigDecimal(v.toString).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  /** Map-side bucket assignment against broadcast `thresholds`
    * (ascending): `bucket` = 1 + number of thresholds strictly below the
    * value; nulls pin to bucket 1 (the same end of the range as ntile's
    * nulls-first placement — without this they'd fall through to the
    * last bucket). Zero shuffle.
    */
  def bucketByThresholds(df: DataFrame, valueCol: String,
                         thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    requireFreeColumns(df, "bucketByThresholds", "bucket")
    val k = thresholds.size + 1
    val bucket = thresholds.zipWithIndex.foldRight(lit(k): Column) {
      case ((t, i), acc) => when(col(valueCol) <= t, lit(i + 1)).otherwise(acc)
    }
    df.withColumn("bucket", when(col(valueCol).isNull, lit(1)).otherwise(bucket))
  }

  /** The A-ES rank expression shared by [[weightedSample]] and
    * [[weightedSamplePerGroup]] — ONE definition so the global and
    * per-group draws can never diverge from each other or the oracles:
    * u = md5-uniform(salt, key) ∈ (0,1], rank = round(ln(u)/w, roundTo).
    * `0.0 +` forces a +0.0 sign: a draw in (−5·10⁻⁷, 0) rounds to −0.0
    * in DuckDB but +0.0 here, and repr-exact oracles see those apart. */
  /** Output-column collision guard: `withColumn` silently REPLACES an
    * existing column, so a pre-existing user `draw`/`shard`/… would be
    * overwritten with sampler scratch and the corruption would surface
    * only downstream. Fail loudly at plan time instead.
    */
  private def requireFreeColumns(df: DataFrame, op: String,
                                 names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"$op writes output column(s) ${clash.mkString(", ")} which already " +
        "exist in the input — rename or drop them first")
  }

  /** Bounded top-n buffer for [[capPerGroupAgg]]: rows as
    * (key, priority), kept sorted by (priority desc, key asc) and
    * trimmed to n — the same bounded-heap shape as Similarity.TopKAgg,
    * so the aggregation PARTIAL-COMBINES map-side. */
  private[ext] final case class CapBuf(items: Seq[(Long, Double)])
  private[ext] final class CapAgg(n: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Double), CapBuf, CapBuf] {
    private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
      s.sortBy { case (k, p) => (-p, k) }.take(n)
    override def zero: CapBuf = CapBuf(Vector.empty)
    // p + 0.0 maps -0.0 to +0.0 BEFORE Scala's total ordering sees it:
    // sortBy ranks 0.0 strictly above -0.0, while the spec-pinned
    // window twin (and SQL oracles) treat signed zeros as equal peers
    // broken by key — unnormalized, a group holding both zero signs
    // could select different rows than capPerGroup.
    // trim keeps the buffer sorted by (-p, key): a row that cannot
    // displace the n-th returns the buffer UNCHANGED — O(1) for the
    // common case instead of a full re-sort per input row (the
    // TopKAgg round-14 fast path; selection identical, ties included)
    override def reduce(b: CapBuf, a: (Long, Double)): CapBuf = {
      val p = a._2 + 0.0
      if (b.items.length >= n && {
        val (wk, wp) = b.items.last
        p < wp || (p == wp && a._1 >= wk)
      }) b
      else CapBuf(trim(b.items :+ ((a._1, p))))
    }
    override def merge(x: CapBuf, y: CapBuf): CapBuf =
      CapBuf(trim(x.items ++ y.items))
    override def finish(r: CapBuf): CapBuf = r
    override def bufferEncoder = org.apache.spark.sql.Encoders.product[CapBuf]
    override def outputEncoder = org.apache.spark.sql.Encoders.product[CapBuf]
  }

  /** [[capPerGroup]]'s skew-safe twin: at most `n` rows per `groupCol`
    * value, highest `priority` first (ties by `keyCol` ascending) —
    * the per-domain / per-source quota every web-scale curation recipe
    * applies (C4 caps pages per host; RefinedWeb caps documents per
    * domain) so one mirror-heavy site cannot dominate the mixture.
    *
    * Same selection as the window formulation
    * (`capPerGroup(df, Seq(group), Seq(priority desc, key asc), n)`,
    * spec-pinned equal), DIFFERENT plan: a window sorts each group's
    * entire mass on ONE task, so the hot group — half a 10⁹-doc corpus
    * from one domain, the exact case quotas exist for — becomes the
    * straggler. The bounded heap partial-combines map-side: every
    * partition contributes at most n rows per group to the shuffle no
    * matter how skewed the input; a group's own cardinality never
    * crosses the wire. Use the window twin when groups are known
    * small-ish and extra columns should ride through unprojected; use
    * this one when any group can be huge.
    *
    * `keyCol` must be unique (it is the tiebreak and the join-back
    * key) and non-null (null keys are excluded, as in every sampler
    * here); null GROUPS form their own quota group, matching window
    * partition semantics. Priorities must be non-null and finite —
    * NaN would sort ABOVE every real priority in SQL engines but
    * below in Scala's sortBy, so it is rejected loudly.
    */
  def capPerGroupAgg(df: DataFrame, groupCol: String, keyCol: String,
                     priority: Column, n: Int): DataFrame = {
    require(n > 0, "n must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val p = priority.cast("double")
    val keyed = df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(keyCol).cast("long").as("__k"),
        when(p.isNull || isnan(p), raise_error(concat(
            lit("capPerGroupAgg: null/NaN priority for key "),
            col(keyCol).cast("string"))))
          .otherwise(p).as("__p"))
      .as[(Option[String], Long, Double)]
    val survivors = keyed
      .groupByKey(_._1) // Option keeps the null group distinct
      .mapValues { case (_, k, p) => (k, p) }
      .agg(new CapAgg(n).toColumn.name("kept"))
      .flatMap { case (_, buf) => buf.items.map(_._1) }
      .toDF(keyCol)
    df.join(survivors, Seq(keyCol), "left_semi")
  }

  private def aesDraw(keyCol: String, weightCol: String,
                      salt: String, roundTo: Int): Column = {
    val h = graft.functions.Strings.md5SliceLong(
      concat(lit(s"$salt:"), col(keyCol).cast("string")), 1, 8)
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0) // (0,1]
    lit(0.0) + round(log(u) / col(weightCol), roundTo)
  }

  /** Rows eligible for a weighted draw: the key exists (it is the
    * randomness source) and the weight is usable. */
  private def drawable(df: DataFrame, keyCol: String,
                       weightCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull &&
      col(weightCol).isNotNull && col(weightCol) > 0)

  /** Weighted sampling without replacement, Efraimidis-Spirakis
    * A-ES: each row draws u = md5-uniform(salt, key) ∈ (0,1] and is
    * ranked by ln(u)/weight (monotone with u^(1/weight)); the top-n
    * ranks ARE a weight-proportional sample — how a curation pipeline
    * draws "mostly high-quality, but not only high-quality" subsets
    * (weight = quality score, length, dedup cluster size…).
    *
    * Like everything in this module the draw is a pure function of
    * (salt, key): reproducible across runs, engines, partitionings, and
    * incremental corpus growth. Rows with null keys or null/non-positive
    * weights are excluded. The only non-map-side step is the global
    * top-n itself (per-partition top-n + driver merge — never a full
    * sort). The rank is rounded to `roundTo` dp before ordering so
    * cross-engine ln ulps cannot flip the cutoff; ties break by key
    * ascending.
    *
    * PRECISION CONTRACT: the rank grid must be much finer than the
    * draw spread or rows collapse into tie classes ranked by key (an
    * id-biased, non-proportional subset). Draws span ~[−ln(2³²)/w_min,
    * 0] ≈ [−22/w_min, 0]: the default 6 dp suits weights up to ~10³
    * (quality scores, capped lengths); for larger weight scales raise
    * `roundTo` (the boundary-flip risk per row is ulp/grid ≈ 10⁻¹⁶ ·
    * 10^roundTo — still negligible at 12) or normalize weights to O(1).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     n: Int, salt: String = "graft",
                     roundTo: Int = 6): DataFrame = {
    require(n > 0, "n must be > 0")
    requireFreeColumns(df, "weightedSample", "draw")
    drawable(df, keyCol, weightCol)
      .withColumn("draw", aesDraw(keyCol, weightCol, salt, roundTo))
      .orderBy(col("draw").desc, col(keyCol).asc)
      .limit(n)
  }

  /** Gumbel-top-k sampling without replacement, proportional to
    * exp(`logWeightCol`) — the draw DSIR-style importance weighting
    * needs ([[graft.ext.TextAnalysis.importanceWeights]] emits LOG
    * ratios): rank = logw + g with Gumbel noise g = −ln(−ln u), and
    * the top-n ranks are a sample ∝ exp(logw). Working in the log
    * domain sidesteps exponentiating the weight, which matters
    * cross-engine: exp is not correctly rounded, so `exp(logw)` fed
    * to [[weightedSample]] could flip rank boundaries between
    * engines, while here logw arrives already rounded and the noise
    * is rounded the same way ln(u)-draws are.
    *
    * Same determinism contract as [[weightedSample]]: u is the md5
    * uniform of (salt, key) — reproducible across runs, engines, and
    * partitionings; u lands strictly inside (0,1) (offset 0.5 on the
    * 32-bit hash, exact in doubles) so the double-log never hits ±∞.
    * Null keys/log-weights are excluded; rank rounds to `roundTo` dp
    * with ties broken by key ascending. The only non-map-side step is
    * the global top-n (per-partition top-n + driver merge).
    */
  def gumbelTopK(df: DataFrame, keyCol: String, logWeightCol: String,
                 n: Int, salt: String = "graft",
                 roundTo: Int = 6): DataFrame = {
    require(n > 0, "n must be > 0")
    requireFreeColumns(df, "gumbelTopK", "draw")
    val h = graft.functions.Strings.md5SliceLong(
      concat(lit(s"$salt:"), col(keyCol).cast("string")), 1, 8)
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0) // (0,1) open
    val g = lit(0.0) - log(lit(0.0) - log(u))
    df.filter(col(keyCol).isNotNull && col(logWeightCol).isNotNull)
      .withColumn("draw", lit(0.0) + round(col(logWeightCol) + g, roundTo))
      .orderBy(col("draw").desc, col(keyCol).asc)
      .limit(n)
  }

  /** [[weightedSample]] within each group: the top-n A-ES draws PER
    * `groupCol` value — how a per-language (or per-source) mixture is
    * drawn with quality-proportional weights in one pass. The window
    * partitions by group, so parallelism is the number of groups and
    * no global order ever materializes.
    */
  def weightedSamplePerGroup(df: DataFrame, keyCol: String, weightCol: String,
                             groupCol: String, nPerGroup: Int,
                             salt: String = "graft",
                             roundTo: Int = 6): DataFrame = {
    require(nPerGroup > 0, "nPerGroup must be > 0")
    requireFreeColumns(df, "weightedSamplePerGroup", "draw", "draw_rank")
    val w = Window.partitionBy(groupCol)
      .orderBy(col("draw").desc, col(keyCol).asc)
    drawable(df, keyCol, weightCol)
      .withColumn("draw", aesDraw(keyCol, weightCol, salt, roundTo))
      .withColumn("draw_rank", row_number().over(w))
      .filter(col("draw_rank") <= nPerGroup)
  }

  /** Deterministic "global shuffle" into training shards: every row gets
    * a pseudorandom shard (md5 bucket of the key) and a stable position
    * within that shard (md5 order) — the randomized-but-reproducible
    * layout a training run wants for its input files, with no RNG state
    * and no global sort. `keyCol` must be unique and non-null (it IS the
    * randomness source; duplicate keys would collide to the same order
    * value and make `pos` nondeterministic among them).
    *
    * Scale shape: shard assignment is a map-side projection; the only
    * exchange is the per-shard `row_number` window, whose partition count
    * is `nShards` — pick shards ≫ executors at scale (10 000 shards over
    * 100 TB ≈ 10 GB each) and parallelism equals the writer fan-out.
    * Writers at any cluster size then produce byte-identical shard files.
    */
  def shuffleShards(df: DataFrame, keyCol: String, nShards: Int,
                    salt: String = "graft"): DataFrame = {
    require(nShards > 0, "nShards must be > 0")
    requireFreeColumns(df, "shuffleShards", "shard", "pos")
    val h = md5(concat(lit(s"$salt:"), col(keyCol).cast("string")))
    val shard = pmod(
      conv(substring(h, 1, 15), 16, 10).cast("long"), lit(nShards.toLong))
    // double-underscore scratch name (the repo convention): a plain "h"
    // would overwrite-then-drop a user column of that name
    val w = Window.partitionBy("shard").orderBy(col("__h").asc, col(keyCol).asc)
    df.withColumn("__h", h).withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }
}
