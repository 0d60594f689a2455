package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.Rounding.reprRound6

/** Deduplication operators for large-scale training-data pipelines.
  *
  * The reference has no dedup of any kind (SURVEY.md §2.3 "not
  * implemented"); these are the extension surface mandated by
  * BASELINE.json. Every operator is a composed DataFrame plan designed
  * around ONE question: what shuffles at 100 TB?
  *
  *  - exact: only (digest, id) pairs shuffle — never document bodies.
  *  - minhash-LSH: signatures are fixed-size (k longs/doc); candidate
  *    generation shuffles (band-hash, id) pairs, so cost scales with
  *    docs × bands, not docs².
  *  - simhash: one 64-bit fingerprint/doc; banding (4×16 bits) finds all
  *    pairs at Hamming ≤ 3 by pigeonhole without a cross join.
  *  - n-gram Jaccard: exact token-join verification — the oracle-checkable
  *    ground truth the sketches approximate. Token join cost is bounded by
  *    `maxDocFrequency` pruning (a token in half the corpus generates
  *    |corpus|²/4 candidate rows and no discriminative signal).
  */
object Dedup {

  /** Shingle construction mode for the near-dup family (minhash /
    * Jaccard / simhash). Word shingles carry the most signal per
    * shingle on space-delimited text, but are nearly BLIND on
    * unsegmented scripts — a Chinese/Japanese/Thai document whitespace-
    * tokenizes to ~one giant token per run, so word-shingled
    * signatures of two near-identical CJK documents share almost
    * nothing. Character k-grams (k≈5, the CCNet/RefinedWeb practice)
    * are script-agnostic; [[Auto]] picks per DOCUMENT by script ratio,
    * so one corpus-wide call handles a mixed multilingual crawl.
    */
  sealed trait ShingleMode
  object ShingleMode {
    /** n-word shingles over lowercase whitespace tokens (default). */
    case object Word extends ShingleMode
    /** k-character shingles over lowercased, whitespace-collapsed
      * text. */
    case object Char extends ShingleMode
    /** Per-document: [[Char]] when ≥ 30% of non-space characters are
      * in unsegmented scripts (CJK/kana/Hangul/Thai), else [[Word]] —
      * the existing lang-id signal, computed as one map-side regex. */
    case object Auto extends ShingleMode
  }

  /** Character class of scripts where whitespace does not delimit
    * words: Thai, Hangul jamo + syllables, the CJK block run (radicals
    * through unified ideographs, incl. kana), compatibility
    * ideographs. `\x{...}` syntax is identical in Java regex and RE2,
    * so SQL oracles replay the same class verbatim. */
  private[ext] val UnsegmentedScriptClass: String =
    "[\\x{0e00}-\\x{0e7f}\\x{1100}-\\x{11ff}\\x{2e80}-\\x{9fff}" +
      "\\x{ac00}-\\x{d7af}\\x{f900}-\\x{faff}]"

  /** Distinct lowercase whitespace tokens: (id, tok). */
  def tokensDF(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).as("id"),
        explode(array_distinct(split(lower(col(text)), "[ \\t\\n\\f\\r]+"))).as("tok"))
      .filter(length(col("tok")) > 0)

  /** Word n-gram shingle ARRAY (pre-distinct) of a text column:
    * documents shorter than n words contribute their whole text as one
    * shingle so they can still be compared. */
  private def wordShingleArray(text: Column, n: Int): Column =
    // native single-pass expression, not the transform/slice HOF chain:
    // HOF lambdas evaluate interpreted AND re-evaluate the split subtree
    // per gram (the top stack in every sf10 shingle profile — see
    // WordNgrams). Byte-identical output, same whole-text fallback.
    graft.functions.Strings.wordNgrams(lower(text), n,
      wholeTextFallback = true)

  /** Lowercased text with every whitespace run collapsed to one space
    * and ends trimmed — the char-shingle normalization (whitespace
    * differences are formatting, not content). */
  private def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "[ \\t\\n\\f\\r]+", " "))

  /** Character k-gram shingle ARRAY (pre-distinct) over the
    * whitespace-normalized text; shorter documents contribute the
    * whole normalized text as one shingle. */
  private def charShingleArray(text: Column, k: Int): Column =
    graft.functions.Strings.charNgrams(normText(text), k,
      wholeTextFallback = true)

  /** Fraction of non-space characters in unsegmented scripts — the
    * [[ShingleMode.Auto]] per-document switch. One map-side regex
    * pass; 0.0 for empty text (word mode). */
  private def unsegmentedRatio(text: Column): Column = {
    val norm = normText(text)
    val nonspace = length(translate(norm, " ", ""))
    val unseg = nonspace -
      length(translate(regexp_replace(norm, UnsegmentedScriptClass, ""), " ", ""))
    when(nonspace > 0, unseg.cast(DoubleType) / nonspace).otherwise(lit(0.0))
  }

  /** Word n-gram shingles, distinct per doc: (id, shingle).
    * NULL-text docs contribute nothing (they cannot be meaningfully
    * near-dup'd; this also matches the oracles' `WHERE text IS NOT
    * NULL` — without the filter they'd get an empty-string shingle and
    * pair with each other).
    */
  def shinglesDF(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.filter(col(text).isNotNull)
      .select(col(id).as("id"),
        explode(array_distinct(wordShingleArray(col(text), n))).as("shingle"))

  /** Shingles under an explicit [[ShingleMode]], distinct per doc:
    * (id, shingle). `n` is the shingle width in MODE units — words for
    * [[ShingleMode.Word]], characters for [[ShingleMode.Char]];
    * [[ShingleMode.Auto]] uses `n` words / `charK` characters chosen
    * per document by [[unsegmentedRatio]] ≥ 0.3. The per-doc branch is
    * one `when` over two map-side array expressions — no extra pass,
    * no shuffle, and a mixed corpus never pays both explosions.
    */
  def shinglesByModeDF(df: DataFrame, id: String, text: String, n: Int,
                       mode: ShingleMode, charK: Int = 5): DataFrame = {
    val t = col(text)
    val arr = mode match {
      case ShingleMode.Word => wordShingleArray(t, n)
      case ShingleMode.Char => charShingleArray(t, charK)
      case ShingleMode.Auto =>
        when(unsegmentedRatio(t) >= 0.3, charShingleArray(t, charK))
          .otherwise(wordShingleArray(t, n))
    }
    df.filter(t.isNotNull)
      .select(col(id).as("id"), explode(array_distinct(arr)).as("shingle"))
  }

  // --------------------------------------------------------------------
  // Exact dedup
  // --------------------------------------------------------------------

  /** Exact dedup survivors: minimum id per content digest. Hashing
    * happens map-side; only (digest, id) shuffles — at 100 TB the
    * shuffle is ~48 bytes/doc regardless of document size.
    */
  def exactSurvivors(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("digest"))
      .agg(min(col(id)).as(id))
      .select(id)

  /** Exact-dedup'd rows (keeps the full surviving row via semi-join —
    * two narrow shuffles instead of shipping texts through the agg).
    */
  def exactDedup(df: DataFrame, id: String, text: String): DataFrame =
    df.join(exactSurvivors(df, id, text), Seq(id), "left_semi")

  /** Distinct content digests of a corpus — the state a long-running
    * ingest pipeline carries between batches (one slim column, suitable
    * for a parquet catalog that grows append-only). */
  def digestCatalog(df: DataFrame, text: String): DataFrame =
    df.select(md5(col(text)).as("digest")).distinct()

  /** Incremental exact dedup: survivors of `batch` that are neither
    * duplicated WITHIN the batch (min id wins) nor already present in
    * the `seen` digest catalog (anti-join). This is how exact dedup
    * actually runs at 100 TB — per-arriving-batch against accumulated
    * state, not as one global pass; both shuffles carry digests only.
    */
  def incrementalSurvivors(batch: DataFrame, seen: DataFrame,
                           id: String, text: String): DataFrame =
    batch.groupBy(md5(col(text)).as("digest"))
      .agg(min(col(id)).as(id))
      .join(seen, Seq("digest"), "left_anti")
      .select(id)

  // --------------------------------------------------------------------
  // Near-dup clusters (connected components over candidate pairs)
  // --------------------------------------------------------------------

  /** Connected components over an undirected pair list
    * (`idA`/`idB` columns): (id, component) where component = the
    * minimum id reachable. Pairwise near-dup output is only half the
    * dedup story — keeping one doc per CLUSTER needs the transitive
    * closure (A~B, B~C ⇒ {A,B,C} together even if A,C never paired).
    *
    * Two size-gated paths, the BHJ-vs-SMJ shape:
    *
    *  - pair list within `maxDriverEdges` (default 2M ≈ 32 MB — the
    *    broadcast-threshold ballpark): ONE pass collects the pairs and
    *    union-find labels them on the driver in milliseconds. Every
    *    near-dup graph at bench SFs — and most real ones, since the
    *    LSH caps deliberately bound the pair stream — is this size,
    *    and burning multi-second distributed label rounds on 32 MB is
    *    engineering malpractice, exactly like sort-merge-joining a
    *    dimension table that fits in a broadcast.
    *  - larger: distributed min-label propagation with pointer
    *    jumping — each round takes the min over self + neighbors
    *    (union + groupBy, one shuffle), then path-halves by replacing
    *    every label with its label's label, so convergence is O(log
    *    diameter) rounds, never a transitive-closure materialization.
    *    Big graphs batch two edge-hops per round: near-dup chains make
    *    convergence edge-hop-bound (measured — extra pointer jumps
    *    don't cut rounds), so hop-batching halves the round overhead
    *    at equal join work.
    *
    * Distributed loop state rides a PERSISTED-RDD ROUND-TRIP, not a
    * chained `Dataset.localCheckpoint`: an lc chain deeper than ~17
    * links re-executes its own history multiplicatively — measured
    * 1.2 s/round flat through round 17, then 2.1/3.4/7.8/20/49/143 s
    * (Spark 4.1.2, minimal 150k-row ring repro, constant data and
    * plan; SCALE.md round 8c). The RDD round-trip stays flat at any
    * depth; each round unpersists the previous one only AFTER the next
    * is materialized and the convergence check has read it, and every
    * 8th round a real localCheckpoint bounds the RDD-lineage depth the
    * task serializer must recurse (persist alone stack-overflowed near
    * round 25).
    *
    * Fail-loud: a graph that hasn't converged inside `maxIterations`
    * throws instead of returning partial (wrong) components (the old
    * silent cap RETURNED partial labels at sf10 — caught by this
    * round's scale run).
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b",
                          maxIterations: Int = 64,
                          onRound: Int => Unit = _ => (),
                          maxDriverEdges: Long = 2000000L): DataFrame = {
    val spark = pairs.sparkSession
    // Null-endpoint edges are dropped BEFORE the size gate so both
    // size-gated paths see the identical graph (null ids never join —
    // CLAUDE.md; previously the driver path dropped the whole edge
    // while the distributed path still labeled the non-null side, a
    // silent path-dependence on null-id data). A node whose only edge
    // touches a null id gets no component row; callers treat missing
    // ids as singleton clusters (the q80 coalesce pattern).
    val fwd = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .filter(col(idA).isNotNull && col(idB).isNotNull)

    // small-graph fast path: one evaluation of the pair stream, capped
    // at maxDriverEdges + 1 rows so an over-budget graph is detected
    // without collecting it (LocalLimit early-exits per partition).
    // Driver memory at the 2M default is a few hundred MB of boxed
    // Rows TRANSIENTLY (the raw payload is 2×8 B/edge; boxing is
    // ~10×) — sized for a driver provisioned like an executor; an
    // over-budget probe pays one capped pass before the distributed
    // path recomputes the stream.
    val capped = fwd.limit(
      math.min(maxDriverEdges, Int.MaxValue - 2L).toInt + 1).collect()
    if (capped.length <= maxDriverEdges) {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      capped.foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      val labels = new Array[(Long, Long)](parent.size())
      val it = parent.keySet().iterator()
      var i = 0
      // roots are unioned min-to-max, so find() IS the min reachable id
      while (it.hasNext) { val k = it.next(); labels(i) = (k, find(k)); i += 1 }
      import spark.implicits._
      return spark.sparkContext
        .parallelize(labels.toIndexedSeq, math.max(1, math.min(32, labels.length / 50000 + 1)))
        .toDF("id", "component")
    }

    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()

    // AQE off for the label rounds: each round is a handful of
    // FIXED-SHAPE exchanges over a label table whose size we know
    // (≤ one row per node); AQE's per-exchange materialize-and-replan
    // round-trips add ~0.5 s of pure scheduling latency per round
    // (measured at sf0.1 — 2× the data time), and none of its
    // benefits (skew splits, runtime broadcast) apply to a frame this
    // regular. Restored in finally — the conf is SESSION-global, so
    // this loop is not concurrency-safe on a shared session: a
    // concurrent query on the same SparkSession runs with AQE off for
    // the duration, and overlapping connectedComponents calls would
    // race the save/restore. Run concurrent instances on separate
    // sessions (`spark.newSession()` — configs are per-session).
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqePrev = spark.conf.get(aqeKey, "true")
    spark.conf.set(aqeKey, "false")
    // loop state rides the shared pin pattern (PinnedLoop — one
    // implementation for this loop and the BPE trainer); release() in
    // finally so a mid-loop failure (including the fail-loud
    // non-convergence throw) can never leak the persisted label blocks
    var loop: PinnedLoop = null
    try {
    loop = PinnedLoop.start(
      edges.select(col("src").as("id")).distinct()
        .withColumn("component", col("id")))
    var labels = loop.current
    // Hops per round, by edge count (cheap — edges is checkpointed):
    // convergence on near-dup graphs is edge-HOP-bound (long chains;
    // measured — doubling pointer JUMPS didn't cut rounds), so a big
    // graph batches two hops per round to halve the round count at
    // equal total edge-join work; a small graph's rounds are all
    // fixed scheduling overhead, so fewer exchanges per round wins.
    val hops = if (edges.count() >= (1L << 17)) 2 else 1
    var converged = false
    var it = 0
    while (!converged && it < maxIterations) {
      // min over self + neighbors, as union + groupBy (NOT agg + join
      // back: one shuffle instead of two, and every node appears in
      // its own union branch so no outer join is needed).
      def hopOnce(l: DataFrame): DataFrame =
        l.select(col("id"), col("component"))
          .union(edges.join(l.withColumnRenamed("id", "dst"), Seq("dst"))
            .select(col("src").as("id"), col("component")))
          .groupBy("id").agg(min(col("component")).as("component"))
      val h2 = if (hops == 2) hopOnce(hopOnce(labels)) else hopOnce(labels)
      // pointer jump: component <- component's component (labels are
      // always node ids, so the self-join is total); the two sides
      // share h2's aggregation exchange via ReuseExchange. Explicit
      // aliases keep the self-join unambiguous.
      val j1 = h2.as("x")
        .join(h2.as("y"), col("x.component") === col("y.id"))
        .select(col("x.id").as("id"), col("y.component").as("component"))
      // the convergence flag rides INSIDE the pinned frame (one
      // materialization job instead of job + a separate check join);
      // reading the flag afterwards is a block scan of the fresh pin.
      // advance() materializes before dropping the previous round and
      // localCheckpoints every 8th round (the lineage-depth bound —
      // see PinnedLoop for the measured failure modes)
      val nextAll = loop.advance(
        j1.join(labels.select(col("id"), col("component").as("__prev")),
            Seq("id"))
          .select(col("id"), col("component"),
            (col("component") =!= col("__prev")).as("__changed")))
      converged = nextAll.filter(col("__changed")).head(1).isEmpty
      labels = nextAll.select("id", "component")
      it += 1
      onRound(it)
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIterations rounds " +
          "— double path-halving covers any real graph in far fewer; " +
          "this indicates a logic bug, not a large input")
    // finish(): ONE final localCheckpoint truly truncates lineage so
    // the result survives the pin release and later block eviction can
    // never cascade a recompute through the loop's RDDs
    loop.finish(_.select("id", "component"))
    } finally {
      if (loop != null) loop.release()
      spark.conf.set(aqeKey, aqePrev)
    }
  }

  // --------------------------------------------------------------------
  // N-gram Jaccard (exact verification path)
  // --------------------------------------------------------------------

  /** All pairs (id_a < id_b) with token-set Jaccard >= tau.
    *
    * Classic distributed set-similarity join: explode to (token, id),
    * self-join on token to count intersections, then reconstruct the
    * union via per-doc set sizes. `maxDocFrequency` drops tokens present
    * in more than that fraction of documents before the join — tokens in
    * half the corpus contribute ~n²/4 candidate rows while carrying no
    * similarity signal, so the guard is ON by default (0.5): the
    * scale-safe library behavior. Pass `None` for exact textbook Jaccard
    * (what the oracle-checked queries bind); pruning shrinks numerator
    * and denominator together, so guarded similarity = similarity of the
    * pruned sets, exactly.
    *
    * `maxTokenDocs` is the ABSOLUTE twin of the fractional guard: a
    * FRACTION alone still admits quadratic blowup at the boundary (one
    * token in exactly half a 10⁹-doc corpus passes df <= 0.5·n yet
    * emits ~10¹⁷ candidate pairs). A token kept by the cap contributes
    * at most cap²/2 pairs REGARDLESS of corpus size — the same
    * bounded-budget shape as the LSH `capBuckets` guard. Both default
    * guards are on; `None` on both gives textbook-exact Jaccard.
    */
  /** The (id, tok) stream behind every exact set-similarity op, with
    * the two hot-token guards applied (shared by [[jaccardPairs]] and
    * [[containmentPairs]] so the guard semantics can never diverge):
    * one df aggregation serves both guards; the corpus count is only
    * paid when the fractional guard needs it. */
  private def guardedTokenStream(df: DataFrame, id: String, text: String,
                                 ngram: Int,
                                 maxDocFrequency: Option[Double],
                                 maxTokenDocs: Option[Long],
                                 mode: ShingleMode,
                                 charK: Int): DataFrame = {
    val t0 =
      if (mode == ShingleMode.Word && ngram <= 1) tokensDF(df, id, text)
      else shinglesByModeDF(df, id, text, ngram, mode, charK)
        .withColumnRenamed("shingle", "tok")
    if (maxDocFrequency.isEmpty && maxTokenDocs.isEmpty) t0
    else {
      val fracBound = maxDocFrequency.map(f => f * df.count())
      val bound = (fracBound, maxTokenDocs.map(_.toDouble)) match {
        case (Some(a), Some(b)) => math.min(a, b)
        case (a, b) => a.orElse(b).get
      }
      val keep = t0.groupBy("tok").agg(count(lit(1)).as("df"))
        .filter(col("df") <= lit(bound))
      t0.join(keep.select("tok"), Seq("tok"), "left_semi")
    }
  }

  def jaccardPairs(df: DataFrame, id: String, text: String, tau: Double,
                   ngram: Int = 1,
                   maxDocFrequency: Option[Double] = Some(0.5),
                   maxTokenDocs: Option[Long] = Some(1000L),
                   mode: ShingleMode = ShingleMode.Word,
                   charK: Int = 5): DataFrame = {
    // Keep the hot candidate-pair stream as NARROW as possible: sizes
    // are attached by joining back onto the (small) aggregated pair set,
    // not carried through the explode. The alternative — ride n along on
    // every token row so no join-back is needed — measured 25.9s vs
    // 16.0s at sf0.1: candidate rows outnumber surviving pairs by orders
    // of magnitude, so widening them costs far more than two broadcast-
    // sized join-backs. (General rule for similarity joins: move payload
    // AFTER the aggregation, never through it.)
    val tPlan = guardedTokenStream(df, id, text, ngram,
      maxDocFrequency, maxTokenDocs, mode, charK)
    // (id, tok) feeds three branches (sizes + both join sides):
    // checkpoint EAGERLY so it computes once. Lazy is NOT enough:
    // Spark submits the sibling consumer stages of one action
    // concurrently, and each recomputes the un-materialized lineage
    // (measured 2.2x on q89's signature scan, SCALE.md round 7) —
    // eager serializes one materializing job first, then every branch
    // reads blocks. Costs plan-BUILD-time execution (a plan audit runs
    // the explode at sf0.001 — cheap); blocks still release with the
    // result (see minhashPairs for the checkpoint-vs-cache rationale).
    val t = tPlan.localCheckpoint(eager = true)
    // sizes from the PRUNED token set: pruning must shrink numerator and
    // denominator together, or identical docs fall below tau whenever
    // they contain frequent tokens (pruned similarity = similarity of
    // the pruned sets, exactly).
    val sizes = t.groupBy("id").agg(count(lit(1)).as("n"))
    val a = t.select(col("id").as("id_a"), col("tok"))
    val b = t.select(col("id").as("id_b"), col("tok"))
    val inter = a.join(b, a("tok") === b("tok") && a("id_a") < b("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  /** Directed containment pairs: (id_inner, id_outer, containment)
    * where containment = |S(inner) ∩ S(outer)| / |S(inner)| ≥ tau over
    * n-gram shingle sets (Broder's containment, the asymmetric twin of
    * resemblance). Jaccard is blind to exactly the duplication a crawl
    * is full of: a snippet quoted inside a 100× larger aggregator page
    * has J ≈ |A|/|B| ≈ 0.01 but containment(A→B) ≈ 1. This finds the
    * quoted/engulfed side so curation can drop the redundant copy (or
    * the aggregator).
    *
    * Same scale shape as [[jaccardPairs]] — shared guarded token
    * stream (both hot-token guards ON by default; pruning shrinks
    * numerator and denominator together, so guarded containment =
    * containment of the pruned sets, exactly), narrow (tok, id)
    * candidate join, sizes attached AFTER aggregation. Each undirected
    * intersection row fans out to its two directed scores via one
    * in-plan explode — the pair subtree is computed once, not once per
    * direction.
    */
  def containmentPairs(df: DataFrame, id: String, text: String, tau: Double,
                       ngram: Int = 3,
                       maxDocFrequency: Option[Double] = Some(0.5),
                       maxTokenDocs: Option[Long] = Some(1000L),
                       mode: ShingleMode = ShingleMode.Word,
                       charK: Int = 5): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    val t = guardedTokenStream(df, id, text, ngram,
        maxDocFrequency, maxTokenDocs, mode, charK)
      .localCheckpoint(eager = true) // sizes + both join sides
    val sizes = t.groupBy("id").agg(count(lit(1)).as("n"))
    val a = t.select(col("id").as("id_a"), col("tok"))
    val b = t.select(col("id").as("id_b"), col("tok"))
    val inter = a.join(b, a("tok") === b("tok") && a("id_a") < b("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    val withSizes = inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
    withSizes
      .select(explode(array(
        struct(col("id_a").as("id_inner"), col("id_b").as("id_outer"),
          (col("inter").cast(DoubleType) / col("n_a")).as("containment")),
        struct(col("id_b").as("id_inner"), col("id_a").as("id_outer"),
          (col("inter").cast(DoubleType) / col("n_b")).as("containment"))))
        .as("e"))
      .select(col("e.id_inner").as("id_inner"),
        col("e.id_outer").as("id_outer"), col("e.containment").as("containment"))
      .filter(col("containment") >= tau)
  }

  /** [[containmentPairs]] via PREFIX FILTERING — same results (asserted
    * in DedupSpec), different candidate generation. Containment is
    * asymmetric, so the prefix principle applies to the INNER side
    * only: C(A→B) ≥ tau needs |A∩B| ≥ ⌈tau·|A|⌉, so B must contain one
    * of A's first |A| − ⌈tau·|A|⌉ + 1 tokens in GLOBAL
    * rarest-first order — the candidate join is inner-PREFIX ×
    * outer-FULL, and hot tokens (the Σdf² spill source) sit at the END
    * of every rarest-first array, so they almost never enter a prefix:
    * each token t contributes prefixdf(t)·df(t) candidate rows instead
    * of df(t)², with prefixdf(t) ≈ 0 exactly where df(t) explodes.
    * Verification is one `array_intersect` over the full sorted
    * hash arrays.
    *
    * Measured at sf1 (50k docs, tau 0.8, default guards) on the
    * SYNTHETIC bench corpus — which is close to this op's worst case,
    * a tiny shared vocabulary making every doc pair share shingles:
    * naive 29.1 s / 22.4 GB spill; prefix over shingle STRINGS 42 s /
    * 7.1 GB (candidates drop, but wide string arrays ride the verify
    * shuffle); prefix over 60-bit hashes 22.1 s / 7.1 GB. On a
    * low-overlap real crawl the prefix join is sparse and the gap
    * widens; where even that is too hot, exact containment is the
    * verification twin — sample or slice it (the q136 board binding)
    * and let LSH near-dup (q17) carry the corpus-wide pass.
    */
  def containmentPairsPrefix(df: DataFrame, id: String, text: String,
                             tau: Double, ngram: Int = 3,
                             maxDocFrequency: Option[Double] = Some(0.5),
                             maxTokenDocs: Option[Long] = Some(1000L),
                             mode: ShingleMode = ShingleMode.Word,
                             charK: Int = 5): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    // Shingles ride as 64-bit xxhash64 keys, not strings: the
    // candidate join keys, the sorted per-doc arrays, and the
    // verification intersect all shrink from ~24-byte shingle strings
    // to 8-byte longs, which is where this operator's shuffle bytes
    // live. Intersection SIZES are what containment needs, so hashes
    // only MERGE keys — the oracle replays the strings and any
    // collision-free hash yields identical counts (round 14 swapped
    // the 60-bit md5-hex chain: hex alloc + base-16 parse per shingle
    // occurrence was pure map-side CPU at 100 TB, and 64-bit keys cut
    // collision odds 16x). The guarded stream feeds dfreq + the
    // per-doc arrays + the outer join side — checkpoint once
    // (multi-consumer rule).
    val t = guardedTokenStream(df, id, text, ngram,
        maxDocFrequency, maxTokenDocs, mode, charK)
      .select(col("id"), xxhash64(col("tok")).as("tok"))
      .localCheckpoint(eager = true)
    val dfreq = t.groupBy("tok").agg(count(lit(1)).as("df"))
    // pref/vtoks split: candidate prefixes in rarest-first order, the
    // full set value-sorted for the codegen'd merge-scan verify (see
    // jaccardPairsPrefix; round-14 optimization)
    val ordered = t.join(dfreq, Seq("tok"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("sorted"))
      .select(col("id"), transform(col("sorted"), s => s.getField("tok")).as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("plen",
        (col("n") - ceil(lit(tau) * col("n")) + 1).cast("int"))
      .select(col("id"), slice(col("toks"), lit(1), col("plen")).as("pref"),
        array_sort(col("toks")).as("vtoks"), col("n"))
      .localCheckpoint(eager = true) // prefixes + both verify sides
    val prefixes = ordered.select(col("id").as("id_inner"),
      explode(col("pref")).as("tok"))
    val cand = prefixes
      .join(t.select(col("id").as("id_outer"), col("tok")), Seq("tok"))
      .filter(col("id_inner") =!= col("id_outer"))
      .select("id_inner", "id_outer").distinct()
    val setsI = ordered.select(col("id").as("id_inner"),
      col("vtoks").as("toks_i"), col("n").as("n_i"))
    val setsO = ordered.select(col("id").as("id_outer"), col("vtoks").as("toks_o"))
    // the verify attach BROADCASTS the array frame deliberately: this
    // op's contract is the bounded-slice exact twin (LSH is the corpus
    // path), and attaching the second array side through a shuffle
    // join ships ~400 B of payload per CANDIDATE — measured 4x the
    // whole op at 10x corpus, where the checkpointed frame's
    // file-derived size estimate crosses the broadcast threshold and
    // flips the plan (q16 at sf10: 300 s SMJ/SHJ vs 40 s broadcast,
    // identical 48.5M candidates)
    cand.join(broadcast(setsI), Seq("id_inner"))
      .join(broadcast(setsO), Seq("id_outer"))
      .withColumn("containment",
        graft.functions.Arrays.sortedIntersectCount(
          col("toks_i"), col("toks_o")).cast(DoubleType) / col("n_i"))
      .filter(col("containment") >= tau)
      .select("id_inner", "id_outer", "containment")
  }

  /** Cross-corpus containment gate: for every document of an incoming
    * `batch`, is it ≥ `tau` CONTAINED in some document the `catalog`
    * already holds? The admission question of an incremental corpus —
    * [[incrementalSurvivors]] answers it for exact bytes,
    * [[incrementalMinhashPairs]] for symmetric Jaccard; this is the
    * asymmetric rung that catches a batch doc which is a SUBSET of an
    * existing page (quote farms, partial mirrors, re-crawls with
    * boilerplate stripped) even when Jaccard is low because the
    * catalog doc is much longer.
    *
    * One verdict row per batch document: the best catalog partner
    * (max containment, id tiebreak), the containment (an exact
    * `inter/n` division — identical in any engine), and the gate flag.
    * A batch doc with no shared shingle — or too short to shingle /
    * null text — keeps a row with NULL partner and `contained` 0:
    * a gate that silently drops the undecidable admits them blind.
    *
    * The document-frequency guard is computed over the UNION of the
    * two shingle streams and pruned from BOTH sides — per-side guards
    * would drop a shingle from one side only and silently miscount
    * every intersection through it. Sizes are post-guard (containment
    * over informative shingles, [[containmentPairs]]' convention).
    * Batch and catalog must not share ids.
    *
    * Scale shape: shingles ride as 60-bit hashes past the guard (8 B
    * join keys, the q16 lesson); the candidate stream is narrow
    * (bid, cid) counts with sizes joined back after aggregation. This
    * is the EXACT gate — at corpus scale bind the batch by contract
    * (a landing-zone batch is bounded by construction) and let the
    * banded [[incrementalMinhashPairs]] carry unbounded backlogs.
    */
  def crossContainmentGate(batch: DataFrame, catalog: DataFrame,
                           id: String, text: String, tau: Double,
                           ngram: Int = 3,
                           maxDocFrequency: Option[Double] = Some(0.5),
                           maxTokenDocs: Option[Long] = Some(1000L),
                           mode: ShingleMode = ShingleMode.Word,
                           charK: Int = 5): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    def stream(df: DataFrame) =
      guardedTokenStream(df, id, text, ngram, None, None, mode, charK)
    val tb0 = stream(batch)
    val tc0 = stream(catalog)
    val (tbG, tcG) =
      if (maxDocFrequency.isEmpty && maxTokenDocs.isEmpty) (tb0, tc0)
      else {
        val totalDocs = batch.count() + catalog.count()
        val fracBound = maxDocFrequency.map(_ * totalDocs)
        val bound = (fracBound, maxTokenDocs.map(_.toDouble)) match {
          case (Some(a), Some(b)) => math.min(a, b)
          case (a, b) => a.orElse(b).get
        }
        // vocabulary-scale; PINNED so the union-wide tokenize+count
        // runs once, not once per semi-join consumer (round-14: the
        // unpinned subtree re-tokenized BOTH corpora inside each side's
        // lineage — the multi-consumer rule, SCALE.md round 7)
        val keep = tb0.select("tok").unionByName(tc0.select("tok"))
          .groupBy("tok").agg(count(lit(1)).as("df"))
          .filter(col("df") <= lit(bound))
          .select("tok")
          .localCheckpoint(eager = true)
        (tb0.join(keep, Seq("tok"), "left_semi"),
          tc0.join(keep, Seq("tok"), "left_semi"))
      }
    // 64-bit xxhash64 keys (the jaccardPairsPrefix rationale: hashes
    // only merge intersection keys, the oracle replays strings)
    def hashed(t: DataFrame) = t.select(col("id"),
      xxhash64(col("tok")).as("tok"))
    // sizes + the candidate join read the batch stream twice: pin it
    val tb = hashed(tbG).localCheckpoint(eager = true)
    val tc = hashed(tcG)
    val nb = tb.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = tb.select(col("id").as("bid"), col("tok"))
      .join(tc.select(col("id").as("cid"), col("tok")), Seq("tok"))
      .groupBy("bid", "cid").agg(count(lit(1)).as("inter"))
    val scored = inter
      .join(nb.select(col("id").as("bid"), col("n")), Seq("bid"))
      .withColumn("containment", col("inter").cast(DoubleType) / col("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bid")
      .orderBy(col("containment").desc, col("cid").asc)
    // batch-scale (one row per batch doc with a candidate); PINNED so
    // the final left-outer's broadcast build does not re-execute the
    // corpus-scale candidate join a second time (round-14: measured as
    // a byte-identical duplicate of the inter stage, ~2x the op)
    val best = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("bid"), col("cid").as("catalog_id"), col("containment"))
      .localCheckpoint(eager = true)
    // the verdict universe keeps the id's ORIGINAL type — a cast here
    // would silently empty the join against the token stream's ids
    // for any non-long id column
    batch.filter(col(id).isNotNull)
      .select(col(id).as("bid")).distinct()
      .join(best, Seq("bid"), "left_outer")
      .select(col("bid").as(id), col("catalog_id"), col("containment"),
        coalesce((col("containment") >= tau).cast("int"), lit(0))
          .as("contained"))
  }

  /** Exact Jaccard pairs via PREFIX FILTERING (the ppjoin-family
    * optimization from the distributed set-similarity-join literature,
    * PAPERS.md): order each document's shingles by ascending global
    * frequency; two sets with J >= tau MUST share a token within each
    * other's first `n - ceil(tau*n) + 1` tokens, so the candidate join
    * runs only on those prefixes (rarest tokens first → tiny candidate
    * lists). Candidates are then verified exactly with a single
    * `array_intersect` over the full sorted shingle arrays.
    *
    * Same results as [[jaccardPairs]] (asserted in DedupSpec), but the
    * token join touches |prefix| ≈ (1-tau)·n rows per doc instead of n,
    * and hot (frequent) tokens — the skew source — are precisely the
    * ones excluded from prefixes.
    */
  def jaccardPairsPrefix(df: DataFrame, id: String, text: String, tau: Double,
                         ngram: Int = 3,
                         mode: ShingleMode = ShingleMode.Word,
                         charK: Int = 5): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    // Shingles ride as 64-bit xxhash64 keys from here on (the
    // [[containmentPairsPrefix]] rationale: candidate join keys and
    // the verify arrays shrink from ~24-byte strings to 8-byte longs,
    // which is where this op's shuffle bytes live). Round 14 swapped
    // the 60-bit md5-hex-prefix chain for xxhash64: the oracle replays
    // the shingle STRINGS (hashes only MERGE join/intersect keys, so
    // any collision-free hash yields identical counts), and the md5
    // chain paid a hex-string alloc + base-16 parse per shingle
    // OCCURRENCE — pure map-side CPU at 100 TB. 64-bit keys also cut
    // collision odds 16x vs the 60-bit space. Checkpointed eagerly:
    // the stream feeds dfreq + the array build, and the arrays feed
    // prefixes + both verify sides (multi-consumer rule).
    val t0 =
      if (mode == ShingleMode.Word && ngram <= 1) tokensDF(df, id, text)
      else shinglesByModeDF(df, id, text, ngram, mode, charK)
        .withColumnRenamed("shingle", "tok")
    val t = t0.select(col("id"), xxhash64(col("tok")).as("tok"))
      .localCheckpoint(eager = true)
    val dfreq = t.groupBy("tok").agg(count(lit(1)).as("df"))
    // per-doc shingles ordered (df asc, tok asc); full array kept for
    // exact verification, prefix exploded for candidate generation
    // pref = the df-ascending prefix (candidate generation); vtoks =
    // the SAME set VALUE-sorted, so the verify intersection runs as a
    // codegen'd zero-allocation merge scan (sorted_intersect_count)
    // instead of array_intersect's per-pair hash set + materialized
    // result array (~16 µs/pair measured on the sf0.1 verify stage,
    // which AQE coalesces to 2-3 tasks; round-14 optimization)
    val ordered = t.join(dfreq, Seq("tok"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("sorted"))
      .select(col("id"), transform(col("sorted"), s => s.getField("tok")).as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("plen",
        (col("n") - ceil(lit(tau) * col("n")) + 1).cast("int"))
      .select(col("id"), slice(col("toks"), lit(1), col("plen")).as("pref"),
        array_sort(col("toks")).as("vtoks"), col("n"))
      .localCheckpoint(eager = true)
    val prefixes = ordered.select(col("id"), explode(col("pref")).as("tok"))
    val a = prefixes.select(col("id").as("id_a"), col("tok"))
    val b = prefixes.select(col("id").as("id_b"), col("tok"))
    val cand = a.join(b, a("tok") === b("tok") && a("id_a") < b("id_b"))
      .select("id_a", "id_b").distinct()
    val setsA = ordered.select(col("id").as("id_a"), col("vtoks").as("toks_a"),
      col("n").as("n_a"))
    val setsB = ordered.select(col("id").as("id_b"), col("vtoks").as("toks_b"),
      col("n").as("n_b"))
    // deliberate broadcast of the array frame — the bounded-slice
    // exact-twin contract (see containmentPairsPrefix): shuffling the
    // candidate stream with arrays attached is 4x the op at 10x
    // corpus, because the checkpointed frame's file-derived estimate
    // crosses the broadcast threshold and flips BHJ -> SMJ
    cand.join(broadcast(setsA), Seq("id_a"))
      .join(broadcast(setsB), Seq("id_b"))
      .withColumn("inter",
        graft.functions.Arrays.sortedIntersectCount(col("toks_a"), col("toks_b")))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  // --------------------------------------------------------------------
  // MinHash + LSH
  // --------------------------------------------------------------------

  /** Mersenne-prime modulus (2^31−1) for the affine minhash family.
    * The base hash and multipliers are both < 2^31, so products stay
    * inside a signed 64-bit long — Spark ANSI mode and any SQL oracle
    * evaluate the arithmetic identically — while a·h reaches ~2^62 and
    * wraps the modulus ~2^31 times. (A first attempt used p = 2^61−1
    * with small multipliers: a·h never exceeded p, every "hash" was
    * monotone in the base value, and the estimator silently degenerated
    * to comparing a single minimum. The wrap is the hash.) */
  val MinhashPrime: Long = (1L << 31) - 1

  /** Per-function affine parameters (a_i, c_i), md5-derived so ANY
    * engine regenerates the identical family: from the first 8 md5 hex
    * digits of "a:i" / "c:i", reduced to a_i ∈ [1, p−1], c_i ∈ [0, p−1].
    * Same replayability trick as [[Similarity.md5SignPlanes]]. */
  def minhashParams(numHashes: Int): Seq[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hexPrefix(s: String): Long =
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
    (0 until numHashes).map { i =>
      (hexPrefix(s"a:$i") % (MinhashPrime - 1) + 1, hexPrefix(s"c:$i") % MinhashPrime)
    }
  }

  /** k minhashes per doc — ONE groupBy with k `min` aggregates (map-side
    * partial), signature is k×8 bytes regardless of document size.
    *
    * Each shingle is hashed ONCE (32-bit md5 prefix reduced mod
    * [[MinhashPrime]] = 2^31−1); the k hash functions are affine mixes
    * `(a_i·h + c_i) mod 2^31−1` of that base.
    * Hashing the string k times was k× the string-scan cost — at 1.5M
    * shingles × 128 hashes that was the dominant term of the whole
    * sketch path. The md5 base + integer mixing (vs the earlier
    * xxhash64) makes every signature value replayable in a SQL oracle
    * (q17) — md5 and 64-bit integer arithmetic are engine-universal,
    * xxhash64 seeding is not.
    */
  def minhashSignatures(df: DataFrame, id: String, text: String,
                        ngram: Int = 3, numHashes: Int = 128,
                        mode: ShingleMode = ShingleMode.Word,
                        charK: Int = 5): DataFrame = {
    val sh = shinglesByModeDF(df, id, text, ngram, mode, charK)
      .withColumn("h",
        graft.functions.Strings.md5SliceLong(col("shingle"), 1, 8)
          % MinhashPrime)
    val mins: Seq[Column] = minhashParams(numHashes).zipWithIndex.map {
      case ((a, c), i) => min((col("h") * a + c) % MinhashPrime).as(s"h$i")
    }
    sh.groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numHashes), bucket by band hash, pair within buckets. Shuffles
    * (band, hash, id) triples — docs × bands rows, never docs².
    *
    * `maxBucketSize` is the skew guard: a bucket with b members emits
    * b²/2 pairs, so one degenerate bucket (every doc hashing together —
    * e.g. a tiny shared vocabulary) turns the candidate step quadratic.
    * Buckets above the cap carry no discriminative signal and are
    * dropped, exactly like document-frequency pruning in the exact path.
    */
  def lshCandidates(sigs: DataFrame, bands: Int,
                    maxBucketSize: Option[Int] = None): DataFrame = {
    // bucket key = the band's values verbatim (joined string), not a
    // hash of them: byte-identical in any engine, so the oracle replays
    // the exact buckets; the shuffle key grows from 8 to ~r×17 bytes,
    // which the candidate-stream shuffle absorbs (measured no change)
    val bounded = capBuckets(
      lshCandidateInput(sigs.select(col("id"), col("sig")), bands), maxBucketSize)
    val l = bounded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val rgt = bounded.select(col("band"), col("bucket"), col("id").as("id_b"))
    l.join(rgt, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Incremental near-dup detection: pairs (est Jaccard >= tau) where
    * at least one side is in the arriving batch — checked against both
    * the batch itself and the signature CATALOG carried from previous
    * batches ([[minhashSignatures]] output, the state a production
    * ingest persists; k longs per doc, append-only). The 100 TB shape:
    * the join PROBES with batch rows only, so per-bucket work is
    * bucket-members × batch-members — never the bucket² of a global
    * re-pairing — and catalog-internal pairs are not re-emitted (they
    * were reported when their batch arrived). A re-ingested id (present
    * in both inputs) uses the BATCH signature — newest text wins. At
    * scale, persist the catalog's banded form alongside to skip
    * re-banding it per batch.
    */
  def incrementalMinhashPairs(batchSigs: DataFrame, catalogSigs: DataFrame,
                              tau: Double, bands: Int = 32,
                              maxBucketSize: Option[Int] = None): DataFrame = {
    // id-only anti-join: the union can never carry one id with two
    // conflicting signatures
    val cat = catalogSigs.select(col("id"), col("sig"))
      .join(batchSigs.select(col("id")), Seq("id"), "left_anti")
    val all = cat.select(col("id"), col("sig"), lit(false).as("isBatch"))
      .union(batchSigs.select(col("id"), col("sig"), lit(true).as("isBatch")))
      .localCheckpoint(eager = true)
    val banded = capBuckets(lshCandidateInput(all, bands), maxBucketSize)
    val x = banded.select(col("band"), col("bucket"), col("id").as("xid"))
    val y = banded.filter(col("isBatch"))
      .select(col("band"), col("bucket"), col("id").as("yid"))
    val cand = x.join(y, Seq("band", "bucket"))
      .filter(col("xid") =!= col("yid"))
      .select(least(col("xid"), col("yid")).as("id_a"),
        greatest(col("xid"), col("yid")).as("id_b"))
      .distinct()
    estimatePairs(cand, all, tau)
  }

  /** Banded (band, bucket, id, ...) rows for a signature table — the
    * shared banding used by [[lshCandidates]] and the incremental path.
    * Carries through any extra columns on `sigs`. NULL signatures band
    * nowhere (dropped — same as the null buckets they used to produce,
    * minus the join-time surprise); a non-null signature whose length
    * `bands` does not divide raises at execution (a fractional band
    * width would silently skip positions). */
  private def lshCandidateInput(sigsRaw: DataFrame, bands: Int): DataFrame = {
    val sigs = sigsRaw.filter(col("sig").isNotNull)
    val extra = sigs.columns.filter(c => c != "id" && c != "sig").map(col)
    // one codegen'd pass per signature (round 14): the
    // sequence/slice/cast/array_join chain evaluated interpreted —
    // bands slice allocs + numHashes long→string casts per DOCUMENT —
    // and the bucket strings are byte-identical (verbatim band values,
    // the oracle-replayed keys); the divides check throws inside the
    // expression, same fail-loud contract as the old assert_true
    sigs.select(Seq(col("id")) ++ extra :+
        posexplode(graft.functions.Arrays.bandedBucketStrings(
          col("sig"), bands)): _*)
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** Bucket-size histogram of a banding config — the diagnostic that
    * says WHERE a candidate flood comes from (a few mega-buckets the
    * cap would drop, vs a sea of mid-size buckets the cap can't touch)
    * before any pair is generated. One row per distinct bucket size:
    * (bsz, n_buckets, pairs = n_buckets · bsz·(bsz−1)/2). Cost: the
    * banding scan + one aggregation — never the pairs themselves. */
  def lshBucketHistogram(sigs: DataFrame, bands: Int): DataFrame =
    lshCandidateInput(sigs.select(col("id"), col("sig")), bands)
      .groupBy("band", "bucket").agg(count(lit(1)).as("bsz"))
      .groupBy("bsz").agg(count(lit(1)).as("n_buckets"))
      .withColumn("pairs",
        (col("n_buckets") * col("bsz") * (col("bsz") - 1) / 2).cast("long"))
      .orderBy(col("bsz").desc)

  /** Closes the LSH tuning loop [[lshBucketHistogram]] /
    * [[lshRecallAuditGrid]] only diagnose: given a target `tau` and a
    * banding grid, recommend the (bands, width) operating point BEFORE
    * any pair is generated — the round-10 74 GB spill (char shingles
    * run at the word-mode 16×4 point) was detectable from exactly this
    * arithmetic, so this operator exists to PREVENT that class of
    * misconfiguration rather than post-mortem it.
    *
    * Per grid config b (width r = numHashes/b), one output row:
    *  - `p_at_tau` = 1 − (1 − tau^r)^b — the S-curve collision
    *    probability for a TRUE pair sitting exactly at the threshold
    *    (pairs above tau collide with higher probability, so this is
    *    the candidate-recall floor of the config). Plan-time constant.
    *  - `s_mid` = (1/b)^(1/r) — the S-curve midpoint, where collision
    *    probability crosses ~1−1/e; a midpoint far below tau means the
    *    config admits a sea of sub-threshold junk.
    *  - `predicted_candidates` = Σ over (band, bucket) of c·(c−1)/2
    *    from the MEASURED bucket histogram — the exact pair volume the
    *    banding join will generate (pre-distinct: the join's shuffle
    *    and compare cost, which is what floods), priced as one banding
    *    aggregation per config, never the pairs themselves.
    *  - `pairs_per_doc`, `feasible` (= p_at_tau ≥ recallFloor AND
    *    pairs_per_doc ≤ maxPairsPerDoc, as int), and `recommended` —
    *    the feasible config with the fewest predicted candidates
    *    (ties: fewer bands). All-infeasible grids return all-zero
    *    `recommended`: the caller must widen the grid or raise the
    *    cap, not silently run a flooding config.
    *
    * S-curve probabilities are snapped to 6 dp via floor(x·1e6+0.5)
    * (the cross-engine pow rule); histogram arithmetic is exact
    * integers; pairs_per_doc is one exact-int IEEE division — so a SQL
    * oracle replays every cell bit-for-bit. Signatures are computed
    * once and eagerly checkpointed (grid-many sibling consumers of one
    * action — the SCALE.md multi-consumer rule). The rank window is
    * single-partition but grid-sized (≤ a handful of rows) by
    * construction.
    */
  def lshAutoRecommend(df: DataFrame, id: String, text: String, tau: Double,
                       numHashes: Int = 64,
                       bandsGrid: Seq[Int] = Seq(8, 16, 32),
                       ngram: Int = 3,
                       mode: ShingleMode = ShingleMode.Word,
                       charK: Int = 5,
                       recallFloor: Double = 0.7,
                       maxPairsPerDoc: Double = 10.0): DataFrame = {
    require(tau > 0.0 && tau < 1.0, "tau must be in (0, 1)")
    require(recallFloor > 0.0 && recallFloor <= 1.0,
      "recallFloor must be in (0, 1]")
    require(maxPairsPerDoc > 0.0, "maxPairsPerDoc must be positive")
    require(bandsGrid.nonEmpty && bandsGrid.distinct.size == bandsGrid.size,
      "bandsGrid must be non-empty with distinct entries")
    bandsGrid.foreach(b => require(b > 0 && numHashes % b == 0,
      s"bands ($b) must divide numHashes ($numHashes)"))
    val snap6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    val sigs = minhashSignatures(df, id, text, ngram, numHashes, mode, charK)
      .localCheckpoint(eager = true)
    val nd = sigs.agg(count(lit(1)).as("n_docs"))
    val perCfg = bandsGrid.sorted.map { b =>
      val r = numHashes / b
      val pAtTau = snap6(1.0 - math.pow(1.0 - math.pow(tau, r), b))
      val sMid = snap6(math.pow(1.0 / b, 1.0 / r))
      lshCandidateInput(sigs.select(col("id"), col("sig")), b)
        .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum((col("c") * (col("c") - 1) / 2).cast(LongType)),
          lit(0L)).as("predicted_candidates"))
        .select(lit(b).as("bands"), lit(r).as("width"),
          lit(pAtTau).as("p_at_tau"), lit(sMid).as("s_mid"),
          col("predicted_candidates"))
    }.reduce(_ union _)
    // one-row extent pattern: the doc count crossJoins (broadcast) onto
    // the grid-sized config table — no collect
    val scored = perCfg.crossJoin(nd)
      .withColumn("pairs_per_doc",
        when(col("n_docs") > 0, col("predicted_candidates").cast(DoubleType)
          / col("n_docs").cast(DoubleType)).otherwise(lit(0.0)))
      .withColumn("feasible",
        (col("p_at_tau") >= recallFloor &&
          col("pairs_per_doc") <= maxPairsPerDoc).cast("int"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(
      col("feasible").desc, col("predicted_candidates").asc, col("bands").asc)
    scored.withColumn("__r", row_number().over(w))
      .withColumn("recommended",
        (col("feasible") === 1 && col("__r") === 1).cast("int"))
      .drop("__r")
      .orderBy(col("bands"))
  }

  /** LSH skew guard shared by every banding consumer: drop (band,
    * bucket) groups larger than `cap` — a bucket with b members emits
    * b²/2 pairs, so one degenerate bucket turns candidates quadratic. */
  private def capBuckets(banded: DataFrame,
                         maxBucketSize: Option[Int]): DataFrame =
    maxBucketSize match {
      case Some(cap) =>
        val keep = banded.groupBy("band", "bucket")
          .agg(count(lit(1)).as("bsz")).filter(col("bsz") <= cap)
          .select("band", "bucket")
        banded.join(keep, Seq("band", "bucket"), "left_semi")
      case None => banded
    }

  /** Attach both signatures to candidate (id_a, id_b) pairs, estimate
    * = agreeing positions / signature length, threshold at `tau` — the
    * tail shared by [[minhashPairs]] and [[incrementalMinhashPairs]]
    * (and replayed verbatim by the q17/q89 oracles). */
  private def estimatePairs(cand: DataFrame, sigs: DataFrame,
                            tau: Double): DataFrame = {
    // codegen'd positional agreement count — the zip_with/filter HOF
    // formulation evaluated interpreted (2·numHashes lambda calls + two
    // intermediate arrays per CANDIDATE PAIR; round-14 optimization)
    val est = graft.functions.Arrays.eqCount(col("sig_a"), col("sig_b"))
      .cast(DoubleType) / size(col("sig_a")).cast(DoubleType)
    cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard", est)
      .filter(col("est_jaccard") >= tau)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Near-dup pairs with minhash-estimated Jaccard >= tau: signatures →
    * LSH candidates → estimate = fraction of agreeing signature
    * positions. End-to-end sketch path; `jaccardPairs` is its exact
    * counterpart for verification.
    */
  def minhashPairs(df: DataFrame, id: String, text: String, tau: Double,
                   ngram: Int = 3, numHashes: Int = 128,
                   bands: Int = 32,
                   maxBucketSize: Option[Int] = None,
                   materializeSignatures: Boolean = true,
                   mode: ShingleMode = ShingleMode.Word,
                   charK: Int = 5): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) — a fractional " +
        "band width silently skips signature positions")
    // signatures feed three plan branches (banding + both pair sides);
    // checkpoint so the shingle+minhash pass runs once, not five
    // times (banding cap-agg + both join sides + both estimate joins) —
    // EAGER: concurrent sibling stages of one action each recompute a
    // lazily-checkpointed lineage (the q89 lesson, SCALE.md round 7).
    // localCheckpoint, NOT cache(): checkpoint blocks (numHashes×8B per
    // doc, memory-and-disk) are released by the ContextCleaner when the
    // result DataFrame is dropped, where a CacheManager entry stays
    // pinned for the session with no clean unpersist point — long-lived
    // sessions that profile many corpora would accumulate it.
    val base = minhashSignatures(df, id, text, ngram, numHashes, mode, charK)
    val sigs =
      if (materializeSignatures) base.localCheckpoint(eager = true) else base
    estimatePairs(lshCandidates(sigs, bands, maxBucketSize), sigs, tau)
  }

  /** Sampled recall/precision audit of a MinHash-LSH configuration —
    * the production question "what fraction of TRUE near-dup pairs
    * does this (numHashes, bands) banding even generate as
    * candidates, and how much junk rides along?", answered without
    * ever running the exact quadratic path on the full corpus.
    *
    * Method: a deterministic fixed-SIZE sample (lowest `sampleSize`
    * ids by `md5(salt:id)` — content-independent, reproducible across
    * runs and engines, computed as a map-side top-k, never a global
    * sort); on the sample, ground truth = exact shingle-set Jaccard >=
    * tau ([[jaccardPairs]], both guards off — the sample bounds the
    * quadratic), candidates = pure banding collisions
    * ([[lshCandidates]], no est threshold). One full-outer join +
    * one aggregate yields a single row:
    * `n_sample, n_true_pairs, n_candidates, n_caught,
    * recall (= caught/true), precision (= caught/candidates)` —
    * ratios null when their denominator is 0 (never NaN).
    *
    * Estimator validity: a pair collides in a band iff their own
    * signatures agree on it — independent of every other document —
    * so sample-restricted banding equals the GLOBAL banding restricted
    * to sample pairs. The one global mechanism a sample cannot see is
    * the `maxBucketSize` cap (bucket population is corpus-wide), so
    * the audit runs UNcapped and reports the sketch-quality ceiling;
    * a capped production run can only lose additional pairs in
    * super-cap buckets, which the cap's own accounting bounds.
    *
    * Cost at any corpus size: one scan for the top-k sample, then
    * everything is sampleSize-bounded (~500k exact comparisons at the
    * default 1000). The same audit shape serves threshold tuning: run
    * it per (bands, tau) grid cell on the SAME pinned sample.
    */
  def lshRecallAudit(df: DataFrame, id: String, text: String, tau: Double,
                     ngram: Int = 3, numHashes: Int = 128,
                     bands: Int = 32, sampleSize: Int = 1000,
                     salt: String = "graft-audit"): DataFrame =
    lshRecallAuditGrid(df, id, text, tau, ngram, numHashes, Seq(bands),
      sampleSize, salt).drop("bands")

  /** [[lshRecallAudit]] over a GRID of banding configs — the tuning
    * loop the audit exists for, priced as ONE audit: the sample, the
    * exact-Jaccard truth and the minhash signatures are each computed
    * once (eager-checkpointed — every grid row consumes all three) and
    * only the banding + collision join re-run per config. One row per
    * `bandsGrid` entry, ordered by bands ascending; more/narrower
    * bands monotonically admit MORE candidate pairs (a b-band
    * collision implies a 2b-band collision on either half), so recall
    * rises and precision falls down the rows — the S-curve trade the
    * grid makes visible. */
  def lshRecallAuditGrid(df: DataFrame, id: String, text: String,
                         tau: Double, ngram: Int = 3, numHashes: Int = 128,
                         bandsGrid: Seq[Int] = Seq(8, 16, 32),
                         sampleSize: Int = 1000,
                         salt: String = "graft-audit"): DataFrame = {
    require(sampleSize > 1, "sampleSize must be > 1")
    require(bandsGrid.nonEmpty && bandsGrid.distinct.size == bandsGrid.size,
      "bandsGrid must be non-empty with distinct entries")
    bandsGrid.foreach(b => require(b > 0 && numHashes % b == 0,
      s"bands ($b) must divide numHashes ($numHashes)"))
    // the sample feeds BOTH the exact path and the sketch path: eager
    // checkpoint so the scan + top-k run once (the multi-consumer rule)
    val sample = df
      .filter(col(id).isNotNull && col(text).isNotNull)
      .withColumn("__h", md5(concat(lit(salt + ":"), col(id).cast("string"))))
      .orderBy(col("__h"), col(id))
      .limit(sampleSize)
      .drop("__h")
      .localCheckpoint(eager = true)
    val truth = jaccardPairs(sample, id, text, tau, ngram,
        maxDocFrequency = None, maxTokenDocs = None)
      .select(col("id_a"), col("id_b"), lit(1L).as("__t"))
      .localCheckpoint(eager = true)
    val sigs = minhashSignatures(sample, id, text, ngram, numHashes)
      .localCheckpoint(eager = true)
    val n = sample.count()
    bandsGrid.sorted.map { b =>
      val cand = lshCandidates(sigs, b, maxBucketSize = None)
        .select(col("id_a"), col("id_b"), lit(1L).as("__c"))
      truth.join(cand, Seq("id_a", "id_b"), "full_outer")
        .agg(
          coalesce(sum(col("__t")), lit(0L)).as("n_true_pairs"),
          coalesce(sum(col("__c")), lit(0L)).as("n_candidates"),
          coalesce(sum(col("__t") * col("__c")), lit(0L)).as("n_caught"))
        .select(lit(b).as("bands"), lit(n).as("n_sample"),
          col("n_true_pairs"), col("n_candidates"), col("n_caught"),
          when(col("n_true_pairs") > 0,
            col("n_caught").cast(DoubleType) / col("n_true_pairs"))
            .as("recall"),
          when(col("n_candidates") > 0,
            col("n_caught").cast(DoubleType) / col("n_candidates"))
            .as("precision"))
    }.reduce(_ union _)
  }

  // --------------------------------------------------------------------
  // Benchmark decontamination
  // --------------------------------------------------------------------

  /** Per-document contamination stats against a benchmark/eval set:
    * how many of the doc's distinct word `ngram`-shingles also appear
    * anywhere in `benchmark`, and the ≥ `minOverlap` flag — the
    * standard pre-training hygiene pass that keeps eval data out of
    * the training corpus (GPT-3/PaLM-style n-gram decontamination).
    *
    * Scale shape: shingles are digested to md5 so only (digest, id)
    * pairs move; the benchmark's distinct digest set is BROADCAST —
    * eval suites are MBs while the corpus is the 100 TB side, so the
    * corpus never shuffles at all (left-semi against the broadcast,
    * one partial-agg count, one broadcast join-back). Every corpus doc
    * keeps a row (zeros when clean).
    */
  /** Shared-shingle counts per corpus doc id, ≥1 rows only. Empty
    * shingles (the short-doc branch's output for ZERO-token texts) are
    * excluded on both sides — a blank benchmark doc must not flag every
    * blank corpus doc as eval leakage. */
  private def contaminationHits(corpus: DataFrame, benchmark: DataFrame,
                                id: String, text: String,
                                ngram: Int): DataFrame =
    contaminationHitsAgainst(corpus,
      benchmarkDigests(benchmark, id, text, ngram), id, text)

  /** A benchmark digest catalog: the distinct shingle digests (one `d`
    * md5 column) PLUS the ngram they were built with. The pair travels
    * together on purpose: a scrub that shingled the corpus at a
    * different width than the catalog would collide on (essentially)
    * nothing, and a fully contaminated corpus would pass "clean" with
    * no error — the exact silent-audit-pass failure the null-key rule
    * also guards against. */
  final case class DigestCatalog(digests: DataFrame, ngram: Int)

  /** The benchmark's digest catalog — the broadcast side of every
    * contamination check. Compute (and persist the inner frame) ONCE
    * per benchmark and feed it to [[decontaminateAgainstDigests]] when
    * the corpus arrives in many pieces (a micro-batched ingest stream,
    * per-shard passes): the eval suite is digested a single time
    * instead of once per piece.
    */
  def benchmarkDigests(benchmark: DataFrame, id: String, text: String,
                       ngram: Int = 8): DigestCatalog =
    DigestCatalog(
      shinglesDF(benchmark, id, text, ngram)
        .filter(length(col("shingle")) > 0)
        .select(md5(col("shingle")).as("d")).distinct(),
      ngram)

  private def contaminationHitsAgainst(corpus: DataFrame,
                                       catalog: DigestCatalog,
                                       id: String, text: String): DataFrame = {
    val c = shinglesDF(corpus, id, text, catalog.ngram)
      .filter(length(col("shingle")) > 0)
      .select(col("id"), md5(col("shingle")).as("d"))
    // shinglesDF is distinct per doc, so the count is distinct shared
    // shingles without a second dedup
    c.join(broadcast(catalog.digests), Seq("d"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_shared_ngrams"))
  }

  /** Substring-level duplication report (the measurement half of
    * ExactSubstr dedup, Lee et al. "Deduplicating Training Data Makes
    * Language Models Better"): for each document, how many characters
    * sit inside a length-`k` window whose content occurs ≥2 times in
    * the corpus (anywhere — other docs or elsewhere in the same doc).
    * `dup_frac` is the gate a curation pipeline thresholds on; the
    * n-gram level complements doc-level MinHash (which misses partial
    * containment) and line-level C4 dedup (which misses non-line-aligned
    * copying).
    *
    * Scale shape: the position stream is (id, pos, md5-digest) — one row
    * per character position. At corpus scale pass `stride > 1`: only
    * windows whose DIGEST ≡ 0 (mod stride) are kept — content-defined
    * sampling (the winnowing idea), so the same substring selects the
    * same sample positions in every document regardless of alignment.
    * (Striding on the document offset would be alignment-DEPENDENT: the
    * same copied span at offsets 0 and 3 would sample disjoint windows
    * and the duplicate would vanish.) Digest computation stays map-side
    * either way; the shuffled stream — counts, semi-join, coverage
    * window — shrinks by the stride factor, and coverage becomes a
    * lower bound. The stream collapses to digest counts
    * (partial-aggregated), survivors semi-join back, and per-doc
    * coverage is a lag-window union of overlapping [pos, pos+k)
    * intervals — all narrow; text itself never shuffles. Digests are
    * md5, so an external SQL oracle replays every stage exactly.
    */
  /** The (id, pos, digest) window stream shared by span MEASUREMENT
    * ([[duplicatedSpanStats]]) and span REMOVAL
    * ([[TextAnalysis.stripDuplicatedSpans]]): one row per sampled
    * window start, content-defined sampling at `stride > 1` (digest ≡
    * 0 mod stride — alignment-independent, see the stats scaladoc).
    * Null-id docs are excluded — per-doc attribution needs an identity,
    * and pooling all null-id docs into one pseudo-document would
    * cross-contaminate their coverage. Eagerly checkpointed: it feeds
    * both the digest counts and the survivor semi-join of one action
    * (the multi-consumer rule, SCALE.md round 7).
    */
  private[ext] def windowDigestStream(df: DataFrame, id: String,
                                      text: String, k: Int,
                                      stride: Int): DataFrame = {
    require(k >= 2, s"window must be >= 2 chars, got $k")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val digAll = df
      .select(col(id).as("id"), col(text).as("t"))
      .filter(col("id").isNotNull && length(col("t")) >= k)
      .select(col("id"),
        explode(sequence(lit(1), length(col("t")) - (k - 1))).as("pos"),
        col("t"))
      .select(col("id"), col("pos"),
        md5(col("t").substr(col("pos"), lit(k))).as("d"))
    (if (stride <= 1) digAll
      else digAll.filter(
        pmod(conv(substring(col("d"), 1, 8), 16, 10).cast(LongType),
          lit(stride.toLong)) === 0))
      .localCheckpoint(eager = true) // feeds counts + the semi-join back
  }

  /** Survivor positions of [[windowDigestStream]]: the (id, pos) rows
    * whose window content occurs ≥2 times corpus-wide. The count
    * collapse is partial-aggregated on the 8-byte-prefix-comparable
    * digest; the join back is a semi-join on the same narrow stream.
    */
  private[ext] def duplicatedWindowPositions(dig: DataFrame): DataFrame = {
    val dupDigests = dig.groupBy("d").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("d")
    dig.join(dupDigests, Seq("d"), "left_semi")
  }

  def duplicatedSpanStats(df: DataFrame, id: String, text: String,
                          k: Int, stride: Int = 1): DataFrame = {
    // Null-id docs are EXCLUDED from the span analysis and reported
    // with NULL stats, not zeros: per-doc attribution needs an
    // identity, and pooling all null-id docs into one pseudo-document
    // would cross-contaminate their coverage (one null-id doc's spans
    // inflating another's dup_frac past 1.0). NULL ≠ clean — a
    // downstream gate must resolve ids upstream, not wave these
    // through.
    val dig = windowDigestStream(df, id, text, k, stride)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val perDoc = duplicatedWindowPositions(dig)
      .withColumn("prev", lag("pos", 1).over(w))
      .withColumn("add",
        when(col("prev").isNull, lit(k))
          .otherwise(least(lit(k), col("pos") - col("prev"))))
      .groupBy("id")
      .agg(count(lit(1)).as("n_dup_windows"), sum(col("add")).as("dup_chars"))
    df.select(col(id).as("id"), length(col(text)).as("n_chars"))
      .join(perDoc.withColumnRenamed("id", "__did"),
        col("id") === col("__did"), "left_outer")
      .select(col("id").as(id), col("n_chars"),
        when(col("id").isNull, lit(null))
          .otherwise(coalesce(col("n_dup_windows"), lit(0L)))
          .as("n_dup_windows"),
        when(col("id").isNull, lit(null))
          .otherwise(coalesce(col("dup_chars"), lit(0L))).as("dup_chars"),
        when(col("id").isNull, lit(null))
          .when(col("n_chars") > 0,
            round(coalesce(col("dup_chars"), lit(0L)) /
              col("n_chars").cast(DoubleType), 6))
          .otherwise(0.0).as("dup_frac"))
  }

  /** Content-level diff between two corpus snapshots: how many distinct
    * document CONTENTS were added, removed, and retained from `oldDf`
    * to `newDf` — the release audit an incremental pipeline runs
    * between corpus versions ("what actually changed?"), where doc-id
    * bookkeeping lies (re-ingested ids, renumbered shards) but content
    * digests do not.
    *
    * Scale shape: both sides collapse to their distinct-digest catalogs
    * map-side (the [[digestCatalog]] state the ingest pipeline already
    * keeps), so the full-outer join compares two narrow digest streams —
    * text never shuffles, and against a PERSISTED catalog the old side
    * is a file-scan of slim state, not a recompute. md5 digests, so a
    * SQL oracle replays the classification exactly.
    */
  def contentDiff(oldDf: DataFrame, newDf: DataFrame,
                  text: String): DataFrame = {
    val o = digestCatalog(oldDf, text).select(col("digest").as("__od"),
      lit(1).as("__o"))
    val n = digestCatalog(newDf, text).select(col("digest").as("__nd"),
      lit(1).as("__n"))
    // <=> : a NULL text digests to a NULL key, which an equi-join would
    // orphan into a phantom added+removed pair (CLAUDE.md null-key rule)
    o.join(n, col("__od") <=> col("__nd"), "full_outer")
      .select(when(col("__o").isNotNull && col("__n").isNotNull, "retained")
        .when(col("__n").isNotNull, "added")
        .otherwise("removed").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n_digests"))
  }

  // --------------------------------------------------------------------
  // Content-defined chunking (CDC) dedup
  // --------------------------------------------------------------------

  /** Chunk-level duplication stats via content-defined chunking (the
    * LBFS/FastCDC idea): each document splits where the digest of the
    * `w`-char window ending a position ≡ 0 (mod `avgChunk`) — the cut
    * points are a function of CONTENT, so a span copied between
    * documents (or shifted within one) chunks IDENTICALLY regardless of
    * alignment, and chunk-digest equality finds it. Chunks average
    * ~`avgChunk` chars. Per doc: `n_chunks`, `n_dup_chunks` (chunks
    * whose content occurs ≥2 times corpus-wide), `dup_chunk_chars`, and
    * the `dup_frac` gate. The granularity ladder this completes:
    * doc-level exact (q15) → chunk-level (THIS — finds copied blocks
    * without paying per-position state) → window-level
    * [[duplicatedSpanStats]] (exact char coverage, one row per sampled
    * position).
    *
    * Scale shape: boundary detection, span assembly, and chunk
    * digesting are ALL array expressions inside the scan — the text
    * never leaves its partition. The only exploded (and shuffled)
    * stream is one (id, chunk_digest, chunk_len) row per CHUNK —
    * ~avgChunk× narrower than the per-position stream of
    * [[duplicatedSpanStats]] — which collapses to digest counts,
    * semi-joins the survivors back, and partial-aggregates per doc.
    * All digests are md5 (+ the same conv-arithmetic as q102), so a
    * SQL oracle replays every boundary and every chunk digest exactly.
    *
    * Documents shorter than `w` form one whole-doc chunk (still
    * dedupable doc-to-doc). Null ids are excluded and report NULL
    * stats (NULL ≠ clean, the [[duplicatedSpanStats]] convention);
    * null/empty texts report zero chunks.
    */
  def cdcChunkStats(df: DataFrame, id: String, text: String,
                    w: Int = 8, avgChunk: Int = 64): DataFrame = {
    require(w >= 2, s"window must be >= 2 chars, got $w")
    require(avgChunk >= 2, s"avgChunk must be >= 2, got $avgChunk")
    val t = col("t")
    val n = length(t)
    // boundary: window [p, p+w) digest ≡ 0 (mod avgChunk) — cut AFTER
    // the window, so chunk spans are [start, bound+w) / [bound+w, ...).
    // Docs shorter than w have NO windows (explicit branch: sequence(1,0)
    // would count DOWN) and fall through to one whole-doc chunk.
    val positions = when(n >= w, sequence(lit(1), n - (w - 1)))
      .otherwise(array().cast("array<integer>"))
    val bounds = filter(
      transform(positions,
        p => struct(p.as("p"),
          pmod(graft.functions.Strings.md5SliceLong(substr(t, p, lit(w)), 1, 8),
            lit(avgChunk.toLong)).as("m"))),
      s => s.getField("m") === 0L)
    val cuts = transform(bounds, b => b.getField("p") + (w - 1))
    // starts = 1 :: cuts+1; ends = cuts :: n. Cuts are strictly
    // increasing, so interior spans are never empty; the one empty span
    // is the TAIL when the last cut lands exactly at position n — the
    // e >= s filter drops it (an md5('') phantom chunk would otherwise
    // cross-match every doc ending on a boundary)
    val starts = concat(array(lit(1)), transform(col("cuts"), c => c + 1))
    val ends = concat(col("cuts"), array(n))
    val spans = filter(
      zip_with(starts, ends, (s, e) => struct(s.as("s"), e.as("e"))),
      se => se.getField("e") >= se.getField("s"))
    val chunks = transform(col("spans"), se =>
      struct(md5(substr(t, se.getField("s"),
          se.getField("e") - se.getField("s") + 1)).as("d"),
        (se.getField("e") - se.getField("s") + 1).cast(LongType).as("len")))
    val perChunk = df
      .filter(col(id).isNotNull && col(text).isNotNull && length(col(text)) > 0)
      .select(col(id).as("id"), col(text).as("t"))
      .withColumn("cuts", cuts)
      .withColumn("spans", spans)
      .select(col("id"), explode(chunks).as("c"))
      .select(col("id"), col("c.d").as("d"), col("c.len").as("len"))
      .localCheckpoint(eager = true) // feeds counts + the join back
    val dupDigests = perChunk.groupBy("d").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("d")
    val perDoc = perChunk
      .join(dupDigests.withColumn("__dup", lit(1L)), Seq("d"), "left_outer")
      .groupBy("id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("__dup"), lit(0L))).as("n_dup_chunks"),
        sum(when(col("__dup").isNotNull, col("len")).otherwise(0L))
          .as("dup_chunk_chars"))
    df.select(col(id).as("id"), length(col(text)).as("n_chars"))
      .join(perDoc.withColumnRenamed("id", "__did"),
        col("id") === col("__did"), "left_outer")
      .select(col("id").as(id), col("n_chars"),
        when(col("id").isNull, lit(null))
          .otherwise(coalesce(col("n_chunks"), lit(0L))).as("n_chunks"),
        when(col("id").isNull, lit(null))
          .otherwise(coalesce(col("n_dup_chunks"), lit(0L)))
          .as("n_dup_chunks"),
        when(col("id").isNull, lit(null))
          .otherwise(coalesce(col("dup_chunk_chars"), lit(0L)))
          .as("dup_chunk_chars"),
        when(col("id").isNull, lit(null))
          .when(col("n_chars") > 0,
            reprRound6(coalesce(col("dup_chunk_chars"), lit(0L)) /
              col("n_chars").cast(DoubleType)))
          .otherwise(0.0).as("dup_frac"))
  }

  def contaminationStats(corpus: DataFrame, benchmark: DataFrame,
                         id: String, text: String,
                         ngram: Int = 8, minOverlap: Long = 1L): DataFrame = {
    require(ngram >= 1, "ngram must be >= 1")
    val hits = contaminationHits(corpus, benchmark, id, text, ngram)
    // no broadcast hint on the join-back: hits is usually tiny (the
    // contaminated slice) and AQE will broadcast it, but it is
    // corpus-bounded in the worst case — a forced hint could OOM.
    // NULL-SAFE join key: a null-id doc's hits aggregate under id NULL,
    // and an equi-join would orphan them — reporting contaminated
    // null-id docs as clean.
    corpus.select(col(id).as("id"))
      .join(hits.withColumnRenamed("id", "__hid"),
        col("id") <=> col("__hid"), "left_outer")
      .select(col("id").as(id),
        coalesce(col("n_shared_ngrams"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("n_shared_ngrams"), lit(0L)) >= minOverlap)
          .as("contaminated"))
  }

  /** The corpus with contaminated documents removed — the actual
    * decontamination filter ([[contaminationStats]] is the audit view).
    * One anti-join against the over-threshold hit set (null-safe, so a
    * contaminated null-id doc is removed and a clean one KEPT — an
    * equi-semi-join would silently drop every null-id row). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    id: String, text: String,
                    ngram: Int = 8, minOverlap: Long = 1L): DataFrame = {
    require(ngram >= 1, "ngram must be >= 1")
    decontaminateAgainstDigests(corpus,
      benchmarkDigests(benchmark, id, text, ngram),
      id, text, minOverlap)
  }

  /** [[decontaminate]] against a pre-built [[benchmarkDigests]]
    * catalog — the split that lets a streaming ingest
    * ([[graft.streaming.Events.streamingDecontaminate]]) digest the
    * benchmark once and scrub every micro-batch against the cached
    * catalog. The corpus shingles at the CATALOG's ngram — the width
    * cannot be supplied separately, so it cannot mismatch. */
  def decontaminateAgainstDigests(corpus: DataFrame,
                                  catalog: DigestCatalog,
                                  id: String, text: String,
                                  minOverlap: Long = 1L): DataFrame = {
    require(catalog.ngram >= 1, "ngram must be >= 1")
    val dirty = contaminationHitsAgainst(corpus, catalog, id, text)
      .filter(col("n_shared_ngrams") >= minOverlap)
      .withColumnRenamed("id", "__hid")
    corpus.join(dirty, corpus(id) <=> dirty("__hid"), "left_anti")
  }

  /** Collect a bounded benchmark embedding table to the driver, ordered
    * by id — the vector twin of the q61 threshold-slice rule: an eval
    * set is driver-scale BY CONTRACT, and the gate THROWS (early-exit
    * `limit(maxRows+1)` probe, never a full scan) rather than silently
    * absorbing a corpus passed in by mistake. Rows must be structurally
    * clean (uniform dimension, no null elements, non-zero norm) — a
    * benchmark is the measuring stick, so a malformed row is an error,
    * not a skip (unlike corpus rows, which get the null-audit path in
    * [[semanticContaminationStats]]).
    */
  def collectBenchmarkVectors(bench: DataFrame, id: String, vec: String,
                              maxRows: Int = 20000): (Array[Long], Array[Array[Double]]) = {
    require(maxRows >= 1, "maxRows must be >= 1")
    val probe = bench.limit(maxRows + 1).count()
    if (probe > maxRows)
      throw new IllegalArgumentException(
        s"collectBenchmarkVectors: benchmark exceeds $maxRows rows — " +
          "an eval set is driver-scale by contract; for corpus-vs-corpus " +
          "semantic dedup use semDedupWith/cosinePairsBlocked instead")
    val rows = bench
      .select(col(id).cast(LongType).as("id"),
        col(vec).cast("array<double>").as("v"))
      .orderBy(col("id").asc)
      .collect()
    require(rows.nonEmpty, "collectBenchmarkVectors: empty benchmark")
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map { r =>
      require(!r.isNullAt(1), "collectBenchmarkVectors: null benchmark vector")
      r.getSeq[Any](1).map {
        case d: java.lang.Double => d.doubleValue()
        case null => throw new IllegalArgumentException(
          "collectBenchmarkVectors: null element in benchmark vector")
      }.toArray
    }
    val dim = vecs(0).length
    require(dim > 0 && vecs.forall(_.length == dim),
      "collectBenchmarkVectors: benchmark vectors must share one dimension")
    (ids, vecs)
  }

  /** Semantic decontamination audit — the embedding rung of the
    * decontamination ladder ([[contaminationStats]] exact n-grams →
    * bloom-prefiltered gate → THIS), catching eval leakage a paraphrase
    * hides from every n-gram method: per corpus vector, the max cosine
    * against the benchmark set, the nearest benchmark id, and a
    * contaminated flag at `tau`.
    *
    * Scale shape: the benchmark rides as a plan-time constant matrix
    * (rows L2-normalized at the driver, entering codegen via
    * `addReferenceObj` — the classifier/DSIR broadcast-model
    * convention), so the corpus is scanned ONCE, the |bench|·dim
    * multiply-adds per row run inside one whole-stage-codegen'd
    * [[graft.functions.Vectors.matVec]] pass, and NOTHING shuffles —
    * no candidate generation, no join, no agg. A 1000-executor cluster
    * does corpus/1000 of the work per node with zero coordination.
    *
    * Cross-engine determinism: matVec and the norm both accumulate
    * left-to-right (bit-identical to DuckDB's `list_dot_product`), the
    * only other ops are /,sqrt (IEEE correctly-rounded), and the output
    * cosine is snapped by `floor(x·1e6 + 0.5)/1e6` — the CLAUDE.md
    * half-point-safe round both engines compute identically — with the
    * flag derived from the SNAPPED value, so flag and score can never
    * disagree across engines. Ties in the argmax go to the LOWEST
    * benchmark id (first index of the max in id-ordered rows).
    *
    * Corpus rows that cannot be scored (null vector, wrong dimension,
    * null element, zero norm) are KEPT with null score/flag — the
    * contaminationStats lesson: an audit that silently drops malformed
    * rows reports contaminated docs as clean.
    */
  /** L2-normalize benchmark rows at the driver (LTR sum of squares —
    * the fold a SQL oracle replays exactly); throws on a zero-norm or
    * ragged row, because a benchmark is the measuring stick. */
  private def unitBenchRows(benchVecs: Array[Array[Double]])
      : Array[Array[Double]] = {
    require(benchVecs.nonEmpty, "semantic decontamination: empty benchmark")
    val dim = benchVecs(0).length
    require(dim > 0 && benchVecs.forall(_.length == dim),
      "semantic decontamination: benchmark vectors must share one dimension")
    benchVecs.map { b =>
      var s = 0.0
      var i = 0
      while (i < dim) { s += b(i) * b(i); i += 1 }
      require(s > 0.0, "semantic decontamination: zero-norm benchmark vector")
      val n = math.sqrt(s)
      b.map(_ / n)
    }
  }

  def semanticContaminationStats(corpus: DataFrame, id: String, vec: String,
                                 benchIds: Array[Long],
                                 benchVecs: Array[Array[Double]],
                                 tau: Double): DataFrame = {
    require(benchIds.nonEmpty && benchIds.length == benchVecs.length,
      "semanticContaminationStats: benchmark ids/vectors must align")
    val unit = unitBenchRows(benchVecs)
    val dim = unit(0).length
    import graft.functions.Vectors
    val vd = col(vec).cast("array<double>")
    // lazily-evaluated guard: matVec THROWS on a dimension mismatch by
    // design (a silently-truncated projection is a wrong sketch), so
    // malformed rows must never reach it — CaseWhen only evaluates the
    // branch value when the condition holds
    val scorable = vd.isNotNull && size(vd) === dim &&
      !exists(vd, x => x.isNull)
    val dots = when(scorable, Vectors.matVec(vd, unit))
    val cnorm = when(scorable, Vectors.norm(vd))
    corpus
      .withColumn("__dots", dots)
      .withColumn("__cnorm", cnorm)
      .withColumn("max_cosine", when(col("__cnorm") > 0.0,
        floor(array_max(col("__dots")) / col("__cnorm") * lit(1e6) +
          lit(0.5)) / lit(1e6)))
      .withColumn("nearest_bench", when(col("__cnorm") > 0.0,
        element_at(lit(benchIds),
          array_position(col("__dots"), array_max(col("__dots")))
            .cast("int"))))
      .withColumn("contaminated", when(col("__cnorm") > 0.0,
        (col("max_cosine") >= tau).cast("int")))
      .select(col(id), col("max_cosine"), col("nearest_bench"),
        col("contaminated"))
  }

  /** The corpus with semantically contaminated documents removed — the
    * filter twin of [[semanticContaminationStats]] (the audit view)
    * and the embedding analog of [[decontaminate]]. Unscorable rows
    * (null vector, wrong dimension, zero norm) are KEPT: the exact
    * path's convention — a doc with no contamination EVIDENCE
    * survives; use the audit view to find and fix the unscorable ones.
    * One map-side expression over the corpus (the benchmark is a plan
    * constant), zero shuffle — which is also why the streaming wrapper
    * ([[graft.streaming.Events.streamingSemanticDecontaminate]]) needs
    * no persisted state at all.
    */
  def semanticDecontaminate(corpus: DataFrame, id: String, vec: String,
                            benchIds: Array[Long],
                            benchVecs: Array[Array[Double]],
                            tau: Double): DataFrame = {
    require(benchIds.nonEmpty && benchIds.length == benchVecs.length,
      "semanticDecontaminate: benchmark ids/vectors must align")
    val unit = unitBenchRows(benchVecs)
    val dim = unit(0).length
    import graft.functions.Vectors
    val vd = col(vec).cast("array<double>")
    val scorable = vd.isNotNull && size(vd) === dim &&
      !exists(vd, x => x.isNull)
    val dots = when(scorable, Vectors.matVec(vd, unit))
    val cnorm = when(scorable, Vectors.norm(vd))
    val snapped = floor(array_max(dots) / cnorm * lit(1e6) + lit(0.5)) /
      lit(1e6)
    // null flag (unscorable) keeps the row: filter on =!= true via a
    // null-safe negation
    corpus.filter(!coalesce(cnorm > 0.0 && snapped >= tau, lit(false)))
  }

  // --------------------------------------------------------------------
  // SimHash
  // --------------------------------------------------------------------

  /** 64-bit simhash fingerprint per document: majority vote per bit over
    * token hashes (each occurrence votes, weight 1). One groupBy with 64
    * sum aggregates; fingerprint assembly is a plain projection.
    *
    * The 64 token-hash bits come from the first 16 md5 hex digits,
    * parsed as two 32-bit halves (a single 16-digit parse would
    * overflow a signed long) — md5 is what lets a SQL oracle replay
    * every fingerprint bit (q18); xxhash64 seeding is engine-private.
    */
  def simhashDF(df: DataFrame, id: String, text: String,
                mode: ShingleMode = ShingleMode.Word,
                charK: Int = 5): DataFrame = {
    // feature stream is NON-distinct (simhash weights by frequency);
    // char mode streams char k-grams so unsegmented scripts carry
    // per-position signal instead of one giant token per run
    val t = col(text)
    val wordFeats = filter(split(lower(t), "[ \\t\\n\\f\\r]+"), x => length(x) > 0)
    val feats = mode match {
      case ShingleMode.Word => wordFeats
      case ShingleMode.Char => charShingleArray(t, charK)
      case ShingleMode.Auto =>
        when(unsegmentedRatio(t) >= 0.3, charShingleArray(t, charK))
          .otherwise(wordFeats)
    }
    val toks = df.filter(t.isNotNull)
      .select(col(id).as("id"), explode(feats).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("lo", graft.functions.Strings.md5SliceLong(col("tok"), 1, 8))
      .withColumn("hi", graft.functions.Strings.md5SliceLong(col("tok"), 9, 8))
    val bitSums: Seq[Column] = (0 until 64).map { j =>
      val bit =
        if (j < 32) shiftright(col("lo"), j)
        else shiftright(col("hi"), j - 32)
      sum(when(bit.bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j")
    }
    val fp = (0 until 64).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    toks.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), fp.as("simhash"))
  }

  /** Banded Hamming self-join over ANY 64-bit fingerprint column:
    * pairs at Hamming distance <= `maxHamming` (must be <= 3 — with 4
    * bands of 16 bits, two fingerprints within Hamming 3 must agree on
    * at least one whole band by pigeonhole, so band equality is an
    * exhaustive blocking key and no cross join ever happens). Shared
    * by text simhash (q18) and image perceptual hashes (q120) — 8
    * bytes shuffle per row regardless of what was fingerprinted.
    * Null-fingerprint rows (e.g. undecodable payloads) are excluded.
    */
  def hammingPairs64(fpDf: DataFrame, idCol: String, fpCol: String,
                     maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x16 banding guarantees recall only to Hamming 3")
    // EAGER checkpoint (the multi-consumer rule, SCALE.md round 7):
    // both join sides consume the fingerprint computation — the narrow
    // (id, fp) frame materializes once, 16B/row
    val fp = fpDf.filter(col(fpCol).isNotNull)
      .select(col(idCol).as("id"), col(fpCol).as("fp"))
      .localCheckpoint(eager = true)
    val banded = fp.select(col("id"), col("fp"),
        posexplode(array((0 until 4).map(b =>
          shiftrightunsigned(col("fp"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("id", "fp", "band", "bucket")
    val l = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("fp").as("fp_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("fp").as("fp_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Simhash pairs at Hamming distance <= maxHamming — [[simhashDF]]
    * fingerprints through the shared [[hammingPairs64]] banding.
    */
  def simhashPairs(df: DataFrame, id: String, text: String,
                   maxHamming: Int = 3,
                   mode: ShingleMode = ShingleMode.Word,
                   charK: Int = 5): DataFrame =
    hammingPairs64(simhashDF(df, id, text, mode, charK), "id", "simhash",
      maxHamming)

  // --------------------------------------------------------------------
  // Embedding-cosine near-dup
  // --------------------------------------------------------------------

  /** All pairs with cosine similarity >= tau — exact O(n²) verification
    * path over a (smallish) embedding set. The scale path for this
    * operation is [[Similarity.lshCosineCandidates]]: random-hyperplane
    * buckets make candidate generation linear in rows × tables.
    */
  def cosinePairs(df: DataFrame, id: String, vec: String, tau: Double): DataFrame = {
    import graft.functions.Vectors
    val v = df.select(col(id).as("id"),
        col(vec).cast("array<double>").as("v"))
      .withColumn("norm", Vectors.norm(col("v")))
    val a = v.select(col("id").as("id_a"), col("v").as("v_a"), col("norm").as("n_a"))
    val b = v.select(col("id").as("id_b"), col("v").as("v_b"), col("norm").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        Vectors.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      // threshold on the ROUNDED value (CLAUDE.md): a pair within ulps
      // of tau must land on the same side in every engine — downstream
      // closures amplify a one-edge divergence into whole-cluster drift
      .filter(round(col("cosine"), 6) >= tau)
      .select("id_a", "id_b", "cosine")
  }

  /** Near-dup cosine pairs, scale path: sign-LSH blocking → exact cosine
    * refine on the candidates only. Every join is a hash join on
    * (table, bucket) or on the id — no nested-loop anywhere (pinned in
    * PlanAuditSpec), and candidate count is bucket-bounded instead of
    * O(n²). Because the hyperplanes are [[Similarity.md5SignPlanes]]
    * (engine-replayable), the candidate set — and therefore the output —
    * is deterministic and fully oracle-checkable in SQL; recall vs the
    * exact [[cosinePairs]] is asserted in DedupSpec. At degenerate-bucket
    * risk (many identical vectors) the same `maxBucketSize`-style cap as
    * minhash applies — keep buckets bounded before the self-join.
    */
  def cosinePairsBlocked(df: DataFrame, id: String, vec: String, tau: Double,
                         tables: Int = 16, nPlanes: Int = 8,
                         dim: Int = 64,
                         maxBucketSize: Option[Int] = None): DataFrame = {
    import graft.functions.Vectors
    // Score INSIDE the bucket join — the round-14 sf100 lesson. Sign-LSH
    // at constant occupancy pairs a linear-in-n but NOISE-DOMINATED
    // candidate stream (random vectors agree on nPlanes sign bits often
    // enough that most collisions fail the tau filter: 518M candidates
    // at 2M vectors, 16 tables, occupancy ~16 — measured at sf100).
    // The previous shape deduped the narrow candidate stream FIRST and
    // then attached both 256 B vectors by id via two shuffle joins; the
    // attach traffic (|distinct candidates| × ~520 B, tens of GB at
    // sf100) spilled past execution memory and filled the disk. Here
    // the vectors arrive WITH their banded rows — a map-side projection
    // of the scan, zero extra shuffle to build — so the (table, bucket)
    // self-join co-locates both vectors, the cosine is computed and
    // thresholded immediately, and only SURVIVORS (true near-dups, the
    // tiny tail) reach the distinct. Cosine is computed once per
    // collision instead of once per distinct pair (~16x more dots) —
    // dim-length codegen'd multiply-adds, orders cheaper than shuffling
    // vector payloads. Output is identical: same pairs, same cosine
    // (vec_dot's accumulation order is fixed), distinct-after-score =
    // score-after-distinct.
    val ps = Similarity.md5SignPlanes(tables, nPlanes, dim)
    // null vectors keep the historical contract (bucket 0 per table;
    // their cosine is null and the tau filter drops them — same rows
    // the narrow-candidate shape produced)
    val zeros = array(Seq.fill(tables)(lit(0L)): _*)
    val wide = df.select(col(id).as("id"), col(vec).as("vraw"),
        // vec_dot/vec_norm widen float elements in-loop — vectors ride
        // in STORED width; the cast below feeds only the bucket hash
        Vectors.norm(col(vec).cast("array<double>")).as("norm"),
        posexplode(coalesce(
          Vectors.signLshBuckets(col(vec).cast("array<double>"), ps), zeros)))
      .toDF("id", "vraw", "norm", "table", "bucket")
    // the LSH skew guard (capBuckets' shape, keyed on (table, bucket)):
    // a near-constant embedding shared by a large corpus fraction lands
    // its whole cluster in ONE bucket per table — b members emit b²/2
    // candidates, so one degenerate direction turns the stream
    // quadratic; an over-cap bucket carries no discriminative signal.
    // The DROP set (buckets over cap) is tiny by construction — the
    // complement of the old keep-semi-join — so it broadcasts and the
    // cap stays map-side; its count aggregation re-derives the NARROW
    // banding (column pruning drops vraw under the agg), which beats
    // materializing or shuffling the wide frame at any corpus size.
    val banded = maxBucketSize match {
      case Some(cap) =>
        val drop = wide.select("table", "bucket")
          .groupBy("table", "bucket")
          .agg(count(lit(1)).as("bsz")).filter(col("bsz") > cap)
          .select("table", "bucket")
        wide.join(broadcast(drop), Seq("table", "bucket"), "left_anti")
      case None => wide
    }
    val l = banded.select(col("table"), col("bucket"), col("id").as("id_a"),
      col("vraw").as("v_a"), col("norm").as("n_a"))
    val r = banded.select(col("table"), col("bucket"), col("id").as("id_b"),
      col("vraw").as("v_b"), col("norm").as("n_b"))
    l.join(r, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        Vectors.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      // threshold on the ROUNDED value (CLAUDE.md): a pair within ulps
      // of tau must land on the same side in every engine — downstream
      // closures amplify a one-edge divergence into whole-cluster drift
      .filter(round(col("cosine"), 6) >= tau)
      .select("id_a", "id_b", "cosine")
      .distinct()
  }

  // --------------------------------------------------------------------
  // SemDeDup (cluster-blocked semantic dedup)
  // --------------------------------------------------------------------

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means cells block the
    * pair search, exact cosine within each cell finds semantic
    * duplicates, and each duplicate group keeps the member FARTHEST
    * from its cell centroid (lowest centroid cosine — the paper's
    * "low-similarity-to-centroid" keep policy, which retains the least
    * prototypical, most informative example).
    *
    * vs [[cosinePairsBlocked]] (sign-LSH blocking): LSH blocks by
    * random hyperplanes and aims for full recall of all near-dup pairs;
    * SemDeDup deliberately scopes dup detection to learned semantic
    * cells — cross-cell near-dups do not merge, by design, and the
    * blocking quality is what the k-means fit buys. At 100 TB the cell
    * count must scale with the corpus (the paper uses ~100k clusters
    * for 1B embeddings) so that expected cell occupancy — and with it
    * the per-cell pair budget — stays constant; `maxCellSize` is the
    * skew guard for cells the quantizer fails to carve (a degenerate
    * cell over the cap contributes no pairs rather than a quadratic
    * blow-up, exactly the [[cosinePairsBlocked]] bucket-cap shape).
    *
    * Only structurally valid vectors (dimension match, no null
    * elements) participate; malformed rows are excluded, mirroring the
    * IVF family's pqRows rule.
    *
    * Plan shape: assignment + centroid score are map-side against the
    * broadcast centroid table; pairs join on `cell`; components are
    * O(log d) pointer-jumping rounds; the narrow (id, cell, score)
    * member frame is consumed by both the size aggregate and the
    * survivor window of one action, so it eager-checkpoints (the
    * multi-consumer rule, SCALE.md round 7) while the wide vector frame
    * stays lazy on purpose.
    *
    * Output: one row per duplicate group (singletons included) —
    * (component, cell, cluster_size, survivor,
    * survivor_centroid_cosine).
    */
  def semDedupWith(df: DataFrame, id: String, vec: String,
                   centroids: Array[Array[Double]], tau: Double,
                   maxCellSize: Option[Int] = None): DataFrame = {
    // scored is consumed THREE times (both sides of the pair self-join
    // + the members join), and the assignment it carries is the n×k×dim
    // argmin — the multi-consumer eager-checkpoint rule (SCALE.md
    // round 7); the frame is one row per vector (stored-width v rides
    // along for the pairing, the operator's working set by design)
    val scored = semDedupScored(df, id, vec, centroids)
      .localCheckpoint(eager = true)
    val pairs = semDedupPairs(scored, tau, maxCellSize)
    val comp = connectedComponents(pairs)
    val members = scored.select(col("id"), col("cell"), col("centroid_cosine"))
      .join(comp, Seq("id"), "left_outer")
      .withColumn("component", coalesce(col("component"), col("id")))
      .localCheckpoint(eager = true) // multi-consumer narrow frame

    val sizes = members.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"), min(col("cell")).as("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component")
      .orderBy(col("centroid_cosine").asc_nulls_last, col("id").asc)
    val surv = members.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("component"), col("id").as("survivor"),
        col("centroid_cosine").as("survivor_centroid_cosine"))
    sizes.join(surv, Seq("component"))
      .select("component", "cell", "cluster_size", "survivor",
        "survivor_centroid_cosine")
  }

  /** [[semDedupWith]]'s assignment + centroid-score stage: one row per
    * structurally valid vector — (id, v, norm, cell, centroid_cosine).
    * Split out (with [[semDedupPairs]]) so the plan-quality audit can
    * pin the pre-checkpoint join shapes: the eager checkpoint inside
    * [[semDedupWith]] truncates lineage, hiding these stages from the
    * final plan (SCALE.md round 7). */
  private[graft] def semDedupScored(df: DataFrame, id: String, vec: String,
                                    centroids: Array[Array[Double]]): DataFrame = {
    import graft.functions.{Pq, Vectors}
    require(centroids.nonEmpty, "semDedup: centroids must be non-empty")
    val dim = centroids(0).length
    val spark = df.sparkSession
    import spark.implicits._

    // the raw (stored-width) vector rides through to the pair join —
    // assignment and scoring cast to double map-side, BEFORE any
    // shuffle, so float32 embeddings never shuffle at double width
    // (the cosinePairsBlocked rule, measured at sf10)
    val valid = df
      .select(col(id).as("id"), col(vec).as("v"))
      .withColumn("__vd", col("v").cast("array<double>"))
      .filter(col("__vd").isNotNull && size(col("__vd")) === dim &&
        !exists(col("__vd"), x => x.isNull))
      .withColumn("norm", Vectors.norm(col("__vd")))
      // argmin-euclid cell, ties to the lower cell (the ivf_cells
      // codegen expression; centroids ride addReferenceObj)
      .withColumn("cell",
        element_at(Pq.ivfCells(col("__vd"), centroids, 1), 1).cast(LongType))

    val ctrFrame = centroids.zipWithIndex
      .map { case (cv, c) => (c.toLong, cv) }.toSeq.toDF("cell", "cv")
      .withColumn("cnorm", Vectors.norm(col("cv")))
    // NULL (not 0/0) for a zero-norm side — the NaN-rank rule: nulls
    // sort LAST under asc_nulls_last in both engines
    valid.join(broadcast(ctrFrame), Seq("cell"))
      .withColumn("centroid_cosine",
        reprRound6(when(col("norm") * col("cnorm") > 0,
          Vectors.dot(col("__vd"), col("cv")) / (col("norm") * col("cnorm")))))
      .select("id", "v", "norm", "cell", "centroid_cosine")
  }

  /** [[semDedupWith]]'s within-cell pairing stage over
    * [[semDedupScored]]'s output: (id_a, id_b) at repr-rounded cosine
    * >= tau. Over-cap cells are excluded from PAIRING only (their
    * members remain singletons in the composed operator). */
  private[graft] def semDedupPairs(scored: DataFrame, tau: Double,
                                   maxCellSize: Option[Int]): DataFrame = {
    import graft.functions.Vectors
    val pairSide = maxCellSize match {
      case Some(cap) =>
        val keep = scored.groupBy("cell")
          .agg(count(lit(1)).as("csz")).filter(col("csz") <= cap)
          .select("cell")
        scored.join(broadcast(keep), Seq("cell"), "left_semi")
      case None => scored
    }
    val a = pairSide.select(col("cell"), col("id").as("id_a"),
      col("v").as("v_a"), col("norm").as("n_a"))
    val b = pairSide.select(col("cell"), col("id").as("id_b"),
      col("v").as("v_b"), col("norm").as("n_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        when(col("n_a") * col("n_b") > 0,
          // vec_dot widens float elements in-loop (no cast allocation)
          Vectors.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))))
      // threshold on the repr-rounded value: a pair within ulps of tau
      // must land on the same side in every engine
      .filter(reprRound6(col("cosine")) >= tau)
      .select("id_a", "id_b")
  }

  // --------------------------------------------------------------------
  // Bloom-prefiltered decontamination (the huge-benchmark scale path)
  // --------------------------------------------------------------------

  /** A Bloom filter over the catalog's digests (keyed on the 60-bit
    * integer prefix of the md5 digest). Built distributed via
    * `stat.bloomFilter`'s treeAggregate; deterministic — no RNG in the
    * sketch's hash family. */
  def digestBloom(catalog: DigestCatalog, fpp: Double = 0.01)
      : org.apache.spark.util.sketch.BloomFilter = {
    val longs = catalog.digests.select(digestLong(col("d")).as("h"))
    // bounded existence scan for sizing would under-size a big catalog;
    // the catalog is benchmark-scale (distinct digests), so one count
    // is cheap and sizes the filter exactly
    val n = math.max(longs.count(), 1L)
    longs.stat.bloomFilter("h", n, fpp)
  }

  private def digestLong(d: Column): Column =
    conv(substring(d, 1, 15), 16, 10).cast(LongType)

  /** [[decontaminate]], Bloom-prefiltered — the shape for a benchmark
    * suite too large to broadcast exactly (the exact path ships the
    * full digest catalog to every task; at a few billion digests that
    * is gigabytes per executor). Two phases:
    *
    *  1. a broadcast Bloom filter (compact: ~1.2 GB at 1e9 digests,
    *     fpp 0.01) drops ~(1−fpp) of clean corpus shingles MAP-SIDE,
    *     inside the scan;
    *  2. the surviving candidate stream — true hits + the fpp sliver —
    *     exact-confirms against the digest catalog with a SHUFFLE join
    *     (deliberately not broadcast: the catalog may be huge, but now
    *     only the tiny candidate stream shuffles with it).
    *
    * Bloom filters have NO false negatives, so phase 2 restores exact
    * semantics: the output is IDENTICAL to [[decontaminate]] — same
    * SQL oracle, bit for bit — while the big corpus-side join input
    * shrinks by ~the clean fraction. Null-id handling matches
    * [[decontaminateAgainstDigests]] (null-safe anti-join).
    */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
                         id: String, text: String,
                         ngram: Int = 8, minOverlap: Long = 1L,
                         fpp: Double = 0.01): DataFrame = {
    require(ngram >= 1, "ngram must be >= 1")
    val catalog = benchmarkDigests(benchmark, id, text, ngram)
    // consumed by the sizing count, the bloom build AND the confirm
    // join — the multi-consumer rule (and the build is an action at
    // construction time regardless, the eager-checkpoint trade)
    val digCk = DigestCatalog(
      catalog.digests.localCheckpoint(eager = true), catalog.ngram)
    val bf = digestBloom(digCk, fpp)
    decontaminateAgainstDigestsBloom(corpus, digCk, bf, id, text, minOverlap)
  }

  /** The bloom-gated scrub against a pre-built catalog + filter — the
    * split that lets a streaming ingest
    * ([[graft.streaming.Events.streamingDecontaminateBloom]]) build the
    * catalog and its bloom ONCE and gate every micro-batch map-side.
    * Phase 1: the codegen'd bloom predicate rides the batch's scan;
    * phase 2: the candidate sliver exact-confirms against the catalog
    * (deliberately not hand-broadcast — the catalog may be huge; only
    * candidates shuffle with it). Output ≡
    * [[decontaminateAgainstDigests]] (no false negatives + exact
    * confirm). */
  def decontaminateAgainstDigestsBloom(corpus: DataFrame,
                                       catalog: DigestCatalog,
                                       bf: org.apache.spark.util.sketch.BloomFilter,
                                       id: String, text: String,
                                       minOverlap: Long = 1L): DataFrame = {
    require(catalog.ngram >= 1, "ngram must be >= 1")
    val cand = shinglesDF(corpus, id, text, catalog.ngram)
      .filter(length(col("shingle")) > 0)
      .select(col("id"), md5(col("shingle")).as("d"))
      .filter(graft.functions.Blooms.mightContainLong(digestLong(col("d")), bf))
    val dirty = cand.join(catalog.digests, Seq("d"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_shared_ngrams"))
      .filter(col("n_shared_ngrams") >= minOverlap)
      .withColumnRenamed("id", "__hid")
    corpus.join(dirty, corpus(id) <=> dirty("__hid"), "left_anti")
  }
}
