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
    // native single-pass n-gram expression (WordNgrams) — the HOF
    // chain evaluated interpreted and re-split the text per gram
    val grams: Column =
      if (ngram == 1)
        filter(split(lower(col(text)), "[ \\t\\n\\f\\r]+"),
          t => length(t) > 0)
      else graft.functions.Strings.wordNgrams(lower(col(text)), ngram,
        wholeTextFallback = false)
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
  /** 60-bit content hash of a token — `md5` prefix, the engine-neutral
    * hash every similarity join here rides (CLAUDE.md): replayable
    * verbatim in DuckDB, collisions ~1e-8 at 10⁷ distinct values.
    * The KMV universe is DEFINED as this hash space (exact counts are
    * over hashes too), so a collision affects both the sketch and its
    * verification identically — the compare never sees it. */
  private def hash60(c: Column): Column =
    graft.functions.Strings.md5SliceLong(c, 1, 15)

  /** The term-occurrence hash stream of a corpus slice: q58 n-gram
    * semantics (lowercase, `[ \t\n\f\r]+` split, docs shorter than n
    * words contribute nothing), one row per OCCURRENCE — deliberately
    * not distinct'd: the KMV sketch dedups inside its bounded
    * per-partition structure and the exact pass dedups in its own
    * aggregation, so this stream stays zero-shuffle map-side work. */
  def termHashes(df: DataFrame, text: String, ngram: Int = 1): DataFrame =
    termStream(df, text, ngram).select(hash60(col("term")).as("h"))

  /** Merge two sorted distinct bottom-k arrays into one (ascending,
    * distinct, ≤ k) — the KMV merge, associative and commutative, so
    * Spark's nondeterministic partition-merge order cannot change the
    * result (a set's k smallest elements are order-free). */
  private[graft] def kmvMerge(a: Array[Long], b: Array[Long],
                              k: Int): Array[Long] = {
    val out = new mutable.ArrayBuffer[Long](k)
    var i = 0; var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (out.isEmpty || out(out.length - 1) != v) out += v
    }
    out.toArray
  }

  /** Bottom-k distinct values of a LONG column (the KMV / theta
    * sketch): per-partition bounded `TreeSet` inside `mapPartitions`
    * (the MG pattern — constant k entries per partition regardless of
    * cardinality; nothing value-keyed shuffles), tree-merged. The
    * driver sees ≤ k longs per merge leaf — the whole point of a
    * sketch; the collect is k-bounded by construction. */
  private[graft] def kmvSketch(df: DataFrame, c: String, k: Int): Array[Long] = {
    val merge = (x: Array[Long], y: Array[Long]) => kmvMerge(x, y, k)
    df.select(col(c).cast("long")).na.drop.rdd
      .mapPartitions { it =>
        val s = new java.util.TreeSet[java.lang.Long]()
        it.foreach { r =>
          val v = r.getLong(0)
          if (s.size < k) s.add(v)
          else if (v < s.last()) { s.add(v); if (s.size > k) s.pollLast() }
        }
        val arr = new Array[Long](s.size)
        var i = 0
        val jt = s.iterator()
        while (jt.hasNext) { arr(i) = jt.next().longValue; i += 1 }
        Iterator(arr)
      }
      .treeAggregate(Array.empty[Long])(merge, merge, depth = 2)
  }

  private val TwoPow60: Double = 1152921504606846976.0d // exact in double

  /** KMV estimate from a bottom-k sketch over the 60-bit space: if the
    * sketch never filled, it IS the support — the count is exact;
    * otherwise (k-1)·2⁶⁰/h₍ₖ₎ (Bar-Yossef et al. '02 / Beyer et al.
    * SIGMOD'07 unbiased form). Every op here — long→double cast, one
    * multiply (exact: 2⁶⁰·(k-1) has a ≤20-bit mantissa), one divide,
    * floor — is IEEE correctly-rounded, so DuckDB replays it
    * bit-for-bit (the ln/exp rule does not apply). */
  private def kmvEstimate(sk: Array[Long], k: Int): Double =
    if (sk.length < k) sk.length.toDouble
    else math.floor((k - 1).toDouble * TwoPow60 / sk(k - 1).toDouble * 1e4) / 1e4

  /** Distinct-cardinality + set-operation estimates between two corpus
    * slices from bottom-k (KMV / theta) sketches, each estimate beside
    * its exact verification — the mergeable-sketch answer to "how much
    * vocabulary do these two corpora share?" when the slices live on
    * different clusters or days and only k longs can travel.
    *
    * Estimators (θ-sketch, Dasgupta et al. / DataSketches practice):
    * with θ = k-th smallest of the UNION sketch, every hash < θ is
    * guaranteed present in both per-slice sketches (θ ≤ each slice's
    * own k-th minimum), so the sample {h < θ} is a fair uniform sample
    * of the union: union ≈ (k-1)·M/θ, jaccard ≈ |both ∧ h<θ|/(k-1),
    * intersection ≈ |both ∧ h<θ|·M/θ. If the union support never
    * fills k, the sketches hold EVERYTHING and all answers are exact.
    *
    * Scale: the sketch passes move k longs per partition (treeAggregate,
    * no value-keyed shuffle) — at any corpus size. The exact columns
    * are the verification twin: one tagged distinct aggregation
    * (hash-keyed shuffle, the thing the sketch exists to avoid) — the
    * q125/q131 audit convention. Output is one row, fully
    * DuckDB-replayable: bottom-k is ORDER BY h LIMIT k, the arithmetic
    * is the exact-double chain above.
    */
  def kmvCompare(a: DataFrame, b: DataFrame, hashCol: String,
                 k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    // each slice's hash stream feeds TWO consumers (its sketch pass and
    // the exact verification union) — checkpoint once so the upstream
    // shingle+md5 scan runs once per slice, not twice (the
    // multi-consumer rule; with the WordNgrams rewrite the whole
    // query measured 47.6 → 7.2 s at sf10)
    val ah = a.select(col(hashCol).cast("long").as("h")).na.drop
      .localCheckpoint(eager = true)
    val bh = b.select(col(hashCol).cast("long").as("h")).na.drop
      .localCheckpoint(eager = true)
    val ska = kmvSketch(ah, "h", k)
    val skb = kmvSketch(bh, "h", k)
    val sku = kmvMerge(ska, skb, k)
    val daEst = kmvEstimate(ska, k)
    val dbEst = kmvEstimate(skb, k)
    val unionEst = kmvEstimate(sku, k)
    // θ-sample intersection: hashes strictly below θ present in BOTH.
    val (interEst, jaccEst) =
      if (sku.length < k) { // union support fits: everything is exact
        val both = ska.toSet.intersect(skb.toSet).size
        val u = sku.length
        (both.toDouble,
          if (u == 0) 0.0 else math.floor(both.toDouble / u * 1e6) / 1e6)
      } else {
        val theta = sku(k - 1)
        val sa = ska.toSet
        val both = skb.count(v => v < theta && sa.contains(v))
        (math.floor(both.toDouble * TwoPow60 / theta.toDouble * 1e4) / 1e4,
          math.floor(both.toDouble / (k - 1).toDouble * 1e6) / 1e6)
      }

    // exact verification: ONE tagged distinct aggregation for all four
    // set sizes (the hash-keyed shuffle the sketch avoids).
    val tagged = ah.select(col("h"),
        lit(1L).as("ina"), lit(0L).as("inb"))
      .unionByName(bh.select(col("h"),
        lit(0L).as("ina"), lit(1L).as("inb")))
      .groupBy("h").agg(max("ina").as("ina"), max("inb").as("inb"))
    tagged.agg(
        sum("ina").cast("long").as("da_exact"),
        sum("inb").cast("long").as("db_exact"),
        count(lit(1)).cast("long").as("union_exact"),
        sum(col("ina") * col("inb")).cast("long").as("inter_exact"))
      // Guard the degenerate both-empty case BEFORE the floor snap:
      // 0/0 is NaN, and Spark floor(NaN) yields 0 while DuckDB's stays
      // NaN — the NaN-before-snap rule. Mirrors the estimate branch's
      // `if (u == 0) 0.0` guard so the two columns agree on empties.
      .withColumn("jaccard_exact",
        when(col("union_exact") > 0,
          floor(col("inter_exact").cast("double") /
            col("union_exact").cast("double") * 1e6) / 1e6)
          .otherwise(lit(0.0)))
      .select(lit(k).as("k"),
        col("da_exact"), lit(daEst).as("da_est"),
        col("db_exact"), lit(dbEst).as("db_est"),
        col("union_exact"), lit(unionEst).as("union_est"),
        col("inter_exact"), lit(interEst).as("inter_est"),
        col("jaccard_exact"), lit(jaccEst).as("jaccard_est"))
  }

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
    // Blocked counting, NOT per-row mgAdd: mgAdd's overflow path sweeps
    // the whole map (O(capacity) per non-member insert), and a diverse
    // stream overflows on nearly every row — measured 311 s at sf10
    // (120M bigrams × 4096 sweeps). Counting a block of 8×capacity
    // rows exactly (O(1)/row) and folding it in with the batched MG
    // merge (one O(block log block) subtract per block) is the
    // mergeable-summaries formulation of the same sketch: identical
    // retention guarantee (any term with freq > N/(capacity+1)
    // survives — the only property pass 2's exact re-count needs),
    // memory still O(capacity) per task. Measured 311 → 49 s at sf10
    // (the residue is the two term-stream scans, linear by design).
    val blockCap = capacity * 8
    val (total, sketch) = terms.select(col("term")).rdd
      .mapPartitions { it =>
        val m = mutable.HashMap.empty[String, Long]
        val block = mutable.HashMap.empty[String, Long]
        var n = 0L
        it.foreach { row =>
          val t = row.getString(0)
          block.put(t, block.getOrElse(t, 0L) + 1L)
          n += 1L
          if (block.size >= blockCap) { mgMerge(m, block, capacity); block.clear() }
        }
        if (block.nonEmpty) mgMerge(m, block, capacity)
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
