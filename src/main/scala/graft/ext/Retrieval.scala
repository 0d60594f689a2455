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
