package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable streaming sketches for corpus-scale frequency questions.
  *
  * The reference has no sketch surface (its profiler takes exact
  * top-10 over Polars group-bys, `processor.rs` — fine at laptop SF);
  * at 100 TB the exact plan's weakness is not the aggregation itself —
  * Spark partial-aggregates map-side — but the SHUFFLE KEYED BY TERM:
  * a web-scale corpus holds billions of distinct n-grams (Heaps' law),
  * so `groupBy(term)` moves a row per distinct term per partition even
  * though only the ~top-k matter. The Misra–Gries path moves a
  * CONSTANT ≤ `capacity` entries per partition regardless of
  * vocabulary size, then pays one narrow exact pass over just the
  * surviving candidates.
  */
object Sketches {

  /** Per-partition Misra–Gries summary: add one occurrence. Classic
    * decrement form — when the map is full and the term is new, every
    * counter drops by 1 (zeros evicted). Each decrement event destroys
    * `capacity + 1` occurrence credits (the new term's own included),
    * so across a stream of N occurrences there are at most
    * N/(capacity+1) decrements: any term with true count >
    * N/(capacity+1) cannot be driven to zero and MUST survive —
    * regardless of arrival or merge order. O(capacity) per decrement
    * event, amortized O(1) per occurrence.
    */
  private[graft] def mgAdd(m: mutable.HashMap[String, Long], term: String,
                         capacity: Int): Unit = {
    val cur = m.getOrElse(term, -1L)
    if (cur >= 0L) m.put(term, cur + 1L)
    else if (m.size < capacity) m.put(term, 1L)
    else {
      val dead = mutable.ArrayBuffer.empty[String]
      val it = m.iterator
      while (it.hasNext) {
        val (k, v) = it.next()
        if (v <= 1L) dead += k else m.put(k, v - 1L)
      }
      dead.foreach(m.remove)
    }
  }

  /** Merge two MG summaries (Agarwal et al., "Mergeable Summaries",
    * PODS'12): sum counts by key, then restore the size bound by
    * subtracting the (capacity+1)-th largest count from every entry
    * and evicting ≤ 0. The subtraction discharges at least
    * (capacity+1)·sub occurrence credits, so the total error bound
    * N/(capacity+1) is preserved under ANY merge tree — which is what
    * makes the candidate set safe under Spark's nondeterministic
    * partition-merge order: a term above threshold survives every
    * order; only sub-threshold stragglers (filtered later by the exact
    * pass) differ.
    */
  private[graft] def mgMerge(a: mutable.HashMap[String, Long],
                           b: mutable.HashMap[String, Long],
                           capacity: Int): mutable.HashMap[String, Long] = {
    b.foreach { case (k, v) => a.put(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(a.size - capacity - 1) // (capacity+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      val it = a.iterator
      while (it.hasNext) {
        val (k, v) = it.next()
        if (v <= sub) dead += k else a.put(k, v - sub)
      }
      dead.foreach(a.remove)
    }
    a
  }

  /** The term-occurrence stream: every word n-gram occurrence (NOT
    * distinct — frequency is the point), q58 semantics: lowercase,
    * `[ \t\n\f\r]+` split, docs shorter than n words contribute
    * nothing. */
  private def termStream(df: DataFrame, text: String, ngram: Int): DataFrame = {
    val toks = filter(split(lower(col(text)), "[ \\t\\n\\f\\r]+"),
      t => length(t) > 0)
    val grams: Column =
      if (ngram == 1) toks
      else when(size(toks) >= ngram,
          transform(sequence(lit(1), size(toks) - (ngram - 1)),
            i => concat_ws(" ", slice(toks, i, lit(ngram)))))
        .otherwise(array().cast("array<string>"))
    df.select(explode(grams).as("term"))
  }

  /** Corpus-wide top-k most frequent word n-grams with EXACT counts,
    * at constant shuffle width: (term, cnt) for every term whose exact
    * count strictly exceeds N/(capacity+1) (N = total n-gram
    * occurrences), ordered by (cnt desc, term asc), first k.
    *
    * Two passes, both cheap where it matters:
    *  1. sketch: per-partition Misra–Gries over the occurrence stream
    *     (mutable map inside `mapPartitions` — the sanctioned
    *     imperative-RDD case), `treeReduce` merge so the driver sees
    *     ≤ capacity entries per merge leaf, never the vocabulary. N
    *     rides the same pass. Nothing term-keyed shuffles at all.
    *  2. verify: exact counts for ONLY the ≤ capacity surviving
    *     candidates — a broadcast semi-join prunes the stream before
    *     the `groupBy`, so the term-keyed shuffle carries ≤ capacity
    *     distinct keys (map-side partial aggs make it ≤ capacity rows
    *     per partition) instead of the full vocabulary.
    *
    * The output is DETERMINISTIC and exactly SQL-replayable even
    * though the merged sketch content depends on Spark's merge order:
    * the MG guarantee puts every above-threshold term in the candidate
    * set under any order, and the exact threshold filter
    * (cnt·(capacity+1) > N, integer arithmetic — no float boundary)
    * removes precisely the order-dependent stragglers. So the result
    * equals "exact counts, HAVING cnt > N/(capacity+1), top k" — which
    * is what the DuckDB oracle computes the brute-force way.
    *
    * Pick capacity ≫ k (default 256× — at 4096 entries a sketch is
    * ~100 KB, irrelevant) so the threshold sits far below the k-th hot
    * term; if the corpus is so flat that fewer than k terms clear the
    * threshold, the result is honestly shorter than k rather than
    * silently order-dependent.
    */
  def heavyHitters(df: DataFrame, text: String, k: Int = 20,
                   ngram: Int = 1, capacity: Int = 4096): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(ngram >= 1, "ngram must be >= 1")
    require(capacity >= math.max(k, 2), "capacity must be >= max(k, 2)")
    val spark = df.sparkSession
    val terms = termStream(df, text, ngram)

    // pass 1: (N, sketch) per partition, tree-merged. depth 2 keeps
    // the driver off the hot path on a 10k-partition cluster scan.
    // treeAggregate (not treeReduce) so an empty scan — zero
    // partitions included — folds to the empty sketch instead of
    // throwing; the per-task zero is deserialized fresh, so mutating
    // merges never share state across tasks.
    val merge: ((Long, mutable.HashMap[String, Long]),
                (Long, mutable.HashMap[String, Long])) =>
        (Long, mutable.HashMap[String, Long]) = {
      case ((na, ma), (nb, mb)) => (na + nb, mgMerge(ma, mb, capacity))
    }
    val (total, sketch) = terms.select(col("term")).rdd
      .mapPartitions { it =>
        val m = mutable.HashMap.empty[String, Long]
        var n = 0L
        it.foreach { row => mgAdd(m, row.getString(0), capacity); n += 1L }
        Iterator((n, m))
      }
      .treeAggregate((0L, mutable.HashMap.empty[String, Long]))(
        merge, merge, depth = 2)

    import spark.implicits._
    if (sketch.isEmpty)
      return Seq.empty[(String, Long)].toDF("term", "cnt")
    val candidates = broadcast(
      sketch.keysIterator.toSeq.toDF("term"))

    // pass 2: exact counts of candidates only; integer threshold.
    terms.join(candidates, Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(capacity.toLong + 1L) > lit(total))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
  }
}
