package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fusing independent rankings of the same corpus.
  *
  * The curation/RAG pattern the single-signal retrievers in this repo
  * feed into: lexical BM25 ([[TextAnalysis.bm25Scores]]) finds exact
  * term matches, embedding cosine ([[Similarity]]) finds paraphrases,
  * and reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09)
  * combines them without score calibration — ranks, not scores, so a
  * BM25 of 14.2 and a cosine of 0.83 need no common scale.
  *
  * Scale shape: fusion operates on the top-k OUTPUTS of the component
  * retrievers, never on the corpus — each input is ≤ k rows per query
  * by construction, so the fuse itself (union + one aggregation + one
  * per-query window) costs O(queries · k · inputs) at ANY corpus size.
  * All corpus-sized work stays inside the component retrievers, which
  * each have their own scale paths (bounded-heap top-k, LSH/IVF ANN).
  */
object Retrieval {

  /** Attach a dense 1-based `rank` to the global top-`k` of `df` by
    * `order` (caller supplies a DETERMINISTIC order — ties must be
    * broken by a key column or ranks are not reproducible).
    *
    * Scale shape: `orderBy.limit(k)` plans as TakeOrderedAndProject —
    * per-partition partial top-k, one k-row collect to a single
    * reducer — so no global sort materializes; the row_number window
    * then runs over ≤ k rows. This is the adapter between a
    * corpus-sized scored frame and [[rrfFuse]]'s bounded inputs.
    */
  def rankTopK(df: DataFrame, order: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"rankTopK: k must be positive, got $k")
    df.orderBy(order: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
  }

  /** Retrieval-quality metrics of a candidate ranking against a truth
    * ranking — the evaluation harness for every ANN index in this repo
    * (is the LSH/IVF/PQ recall trade actually worth it on MY corpus?).
    * Inputs carry `queryCols ++ (id, rank)`; both are cut at top-`k`.
    * Output per query: `n_truth`, `n_hits`, `recall` (hits /
    * min(k, n_truth)), `mrr` (1/rank of the first true item in the
    * candidate list, 0 if none), `ndcg` (binary relevance against
    * truth-membership, log2 discounts, ideal = all truth items packed
    * at the top). All three snapped to 6 dp with the cross-engine
    * floor form.
    *
    * Cross-engine exactness: the DCG and IDCG float sums NEVER ride a
    * shuffle-ordered SUM — hit ranks are collected, SORTED, and folded
    * sequentially (`aggregate` over `sort_array`), and IDCG folds
    * `sequence(1, …)` the same way, so both engines accumulate in
    * ascending-rank order; ln is the only non-correctly-rounded op and
    * the 6 dp snap absorbs it (the q124 rule).
    *
    * Scale shape: both inputs are top-k-bounded per query, so every
    * join and aggregation here is O(queries · k) at any corpus size —
    * like [[rrfFuse]], all corpus-sized work lives in the retrievers.
    */
  def rankingMetrics(truth: DataFrame, cand: DataFrame,
                     queryCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"rankingMetrics: k must be >= 1, got $k")
    require(queryCols.nonEmpty, "rankingMetrics: queryCols must be non-empty")
    val qc = queryCols.map(col)
    val sel = (queryCols :+ "id" :+ "rank").map(col)
    val tK = truth.filter(col("rank") <= k).select(sel: _*)
    val cK = cand.filter(col("rank") <= k).select(sel: _*)
    val tsz = tK.groupBy(qc: _*).agg(count(lit(1)).as("n_truth"))
    val hits = cK.join(tK.select((queryCols :+ "id").map(col): _*),
      queryCols :+ "id")
    val hagg = hits.groupBy(qc: _*).agg(
      count(lit(1)).as("__h"),
      min(col("rank")).as("__min_rank"),
      sort_array(collect_list(col("rank").cast("double"))).as("__ranks"))
    def gain(r: Column) = lit(1.0) / (log(r + lit(1.0)) / log(lit(2.0)))
    val dcg = aggregate(col("__ranks"), lit(0.0), (acc, r) => acc + gain(r))
    val idcg = aggregate(
      sequence(lit(1), least(lit(k.toLong), col("n_truth")).cast("int")),
      lit(0.0), (acc, i) => acc + gain(i.cast("double")))
    val r6 = (c: Column) => graft.functions.Rounding.reprRound(c, 6)
    tsz.join(hagg, queryCols, "left")
      .withColumn("n_hits", coalesce(col("__h"), lit(0L)))
      .select(qc ++ Seq(col("n_truth"), col("n_hits"),
        r6(col("n_hits").cast("double") /
          least(lit(k.toLong), col("n_truth")).cast("double")).as("recall"),
        r6(coalesce(lit(1.0) / col("__min_rank").cast("double"), lit(0.0)))
          .as("mrr"),
        r6(when(col("n_hits") > 0, dcg / idcg).otherwise(lit(0.0)))
          .as("ndcg")): _*)
  }

  /** Reciprocal-rank fusion of `rankings` of the same id space: each
    * input carries `queryCols ++ idCols` plus a `rank` column; the
    * fused score of an id is Σ_i 1/(kRrf + rank_i) over the inputs
    * that ranked it (absent ⇒ contributes 0). Output per query:
    * `queryCols ++ idCols`, one nullable BIGINT `rank_<i>` per input,
    * `rrf` (6 dp), and `fused_rank` (1-based, ≤ topK; ties broken by
    * idCols ascending so the fusion is deterministic).
    *
    * Cross-engine exactness: per-input ranks are aggregated as exact
    * integers (min-when over the union — min is a no-op since each
    * input holds an id at most once, but makes duplicate inputs safe),
    * and the rrf sum is evaluated in FIXED input order as a column
    * expression over those integer ranks — one correctly-rounded IEEE
    * division and add per input, bit-identical in any engine — never
    * as a float SUM whose accumulation order the shuffle could vary.
    *
    * The per-query window is safe at any scale because its partition
    * is ≤ Σ_i k_i rows by the bounded-input precondition — pass
    * outputs of [[rankTopK]] / `bruteForceTopK`-style retrievers, not
    * corpus-sized scored frames.
    */
  def rrfFuse(rankings: Seq[DataFrame], queryCols: Seq[String],
              idCols: Seq[String], kRrf: Int = 60,
              topK: Int = 10): DataFrame = {
    require(rankings.size >= 2, "rrfFuse: need at least two rankings")
    require(kRrf >= 1, s"rrfFuse: kRrf must be >= 1, got $kRrf")
    require(topK >= 1, s"rrfFuse: topK must be >= 1, got $topK")
    require(idCols.nonEmpty, "rrfFuse: idCols must be non-empty")
    val keyCols = queryCols ++ idCols
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select((keyCols.map(col) :+ col("rank").cast("long").as("__r")
        :+ lit(i).as("__src")): _*)
    }.reduce(_ unionByName _)
    val rankAggs = rankings.indices.map(i =>
      min(when(col("__src") === lit(i), col("__r"))).as(s"rank_$i"))
    val agg0 = tagged.groupBy(keyCols.map(col): _*)
      .agg(rankAggs.head, rankAggs.tail: _*)
    val rrf = rankings.indices.map(i =>
      coalesce(lit(1.0) / (lit(kRrf.toDouble) + col(s"rank_$i").cast("double")),
        lit(0.0))).reduce(_ + _)
    val order = col("__rrf").desc +: idCols.map(c => col(c).asc)
    val w =
      if (queryCols.isEmpty) Window.orderBy(order: _*)
      else Window.partitionBy(queryCols.map(col): _*).orderBy(order: _*)
    agg0.withColumn("__rrf", rrf)
      .withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topK)
      .withColumn("rrf", graft.functions.Rounding.reprRound(col("__rrf"), 6))
      .drop("__rrf")
      .select((keyCols.map(col) ++ rankings.indices.map(i => col(s"rank_$i"))
        :+ col("rrf") :+ col("fused_rank")): _*)
  }
}
