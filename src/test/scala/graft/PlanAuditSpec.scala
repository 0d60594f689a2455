package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality regression tests: the properties that make queries
  * survive a 100 TB scale-up, asserted on the physical plan so a
  * refactor can't silently lose them. (ExplainAudit is the interactive
  * twin; these are the load-bearing invariants pinned in CI.)
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def exchanges(p: String): Int = p.split("Exchange").length - 1

  test("q1: the date filter reaches the parquet scan; schema is pruned") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "filter must push into the scan")
    assert("ReadSchema: [^\n]+".r.findFirstIn(p).exists(!_.contains("l_comment")),
      "unused columns must not be read")
  }

  test("q2 (compiled filter): all predicates pushed, zero exchanges") {
    val p = plan("q2_filter")
    assert(p.contains("PushedFilters:"))
    Seq("GreaterThan(l_quantity", "LessThanOrEqual(l_discount", "Not(EqualTo(l_returnflag")
      .foreach(f => assert(p.contains(f), s"expected pushed filter $f"))
    assert(exchanges(p) === 0, "a pure filter+project must not shuffle")
  }

  test("q26: dimension joins broadcast; region filter pushes into its scan") {
    val p = plan("q26_join_revenue")
    assert(p.split("BroadcastHashJoin").length - 1 >= 2,
      "nation and region must join as broadcasts")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      "the region filter must reach the region scan")
  }

  test("q56 (hash sample): map-side filter, single aggregation shuffle") {
    val p = plan("q56_sample")
    assert(exchanges(p) <= 2, // partial->final agg (+AQE counts nothing)
      s"hash sampling must stay map-side, got plan:\n$p")
  }

  test("q55 (grouping sets): one exchange, of PARTIAL aggregates only") {
    // r4 flagged an apparent 2.7x regression; clean re-runs showed
    // steady-state ~1.4s with the delta = first-run codegen + board
    // load. The plan property that must not regress: Expand feeds a
    // map-side partial HashAggregate, so the single shuffle carries
    // (groups x sets) partial rows, never the expanded corpus.
    val p = plan("q55_grouping_sets")
    assert(p.contains("Expand"), "grouping sets must plan as Expand")
    // formatted explain prints each operator twice (tree + detail), so
    // one Exchange node => count 2 (the q86 counting convention)
    assert(exchanges(p) === 2,
      s"exactly one exchange node (partial->final agg):\n$p")
    assert(p.contains("partial_count"),
      "partial aggregation must run map-side before the exchange")
  }

  test("q57 (text cleaning): pure projection, zero exchanges") {
    val p = plan("q57_clean")
    assert(exchanges(p) === 0, "cleaning is a map-side projection")
  }

  test("q22/q23/q25/q96 (token counts, quality, fingerprints, entropy): no shuffle") {
    Seq("q22_token_counts", "q23_quality", "q25_fingerprint",
        "q96_char_entropy").foreach { q =>
      assert(exchanges(plan(q)) === 0, s"$q must be map-side only")
    }
  }

  test("q59 (train/test split) groups once: split is not a join") {
    val p = plan("q59_train_test")
    assert(!p.contains("Join"), "split must be a column, not a join")
    assert(exchanges(p) <= 2)
  }

  test("q116 (ivf-pq): cell joins are broadcast-equi, index never sort-merges") {
    val p = plan("q116_ivf_pq")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the codes-only index must meet queries/candidates via broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"probing must stay an equi-join on cell:\n$p")
  }

  test("q19 (blocked cosine pairs): hash joins only, no nested loop") {
    val p = plan("q19_cosine_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"blocked cosine must not degrade to a nested loop:\n$p")
  }

  test("q19/q104: cosine scores INSIDE the bucket join — no id-keyed " +
       "vector-attach joins after the candidate stream (round-14 sf100 pin)") {
    // The narrow-candidates-then-attach shape shuffled |distinct
    // candidates| x ~520 B of vector payload and died on spill at
    // sf100 (518M candidates at 2M vectors). The fixed shape has
    // exactly ONE shuffled join — the (table, bucket) self-join whose
    // rows already carry their vectors map-side — plus at most the
    // broadcast ANTI join of the over-cap drop set. A reappearing
    // id_a/id_b-keyed equi-join means the payload attach is back.
    // (q19 is the pure cosinePairsBlocked plan; q104 stacks CC + the
    // survivor join downstream, so only q19 pins the operator shape.)
    val p = plan("q19_cosine_pairs")
    val shuffledJoins =
      p.split("SortMergeJoin").length - 1 + p.split("ShuffledHashJoin").length - 1
    assert(shuffledJoins <= 1,
      s"q19: expected at most ONE shuffled join (the bucket self-join); " +
        s"an id-keyed vector attach has returned:\n$p")
  }

  // Queries where a nested-loop operator is the intended, bounded design
  // (not an O(n²)-rows scale risk) — each with the reason it is safe:
  //  - q72_cross: the deliberate region×nation dimension grid (5×25 rows).
  //  - q20_ann_topk: bruteForceTopK broadcasts the tiny query set with a
  //    non-equi (id != qid) condition; the corpus streams ONCE map-side —
  //    linear in corpus size, the documented exact-ranking baseline.
  //  - q71_resample / q79_skew / q91_tfidf / q97_surprisal: a single-row
  //    bounds/total/corpus-count aggregate is crossJoined (broadcast)
  //    onto the stream — one row by construction, the standard way to
  //    attach a global extent without a collect.
  //  - q92_knn: the neighbor stage is q20's broadcast-queries pattern
  //    (tiny query set, non-equi id != qid); shuffle stays bounded at
  //    queries × partitions × k by the TopKAgg heap.
  //  - q106_quantize_int8: the dim-sized (one-row) min/max bounds
  //    aggregate crossJoins (broadcast) back onto the scan — the same
  //    single-row-extent pattern as q71/q79/q97.
  //  - q107_bigram_surprisal: the one-row vocabulary-size aggregate (V)
  //    crossJoins onto the aggregated (doc, bigram) stream.
  //  - q108_mixture_plan: the one-row bottleneck (t_max, covered)
  //    aggregate crossJoins onto the group-count-sized plan table.
  //  - q112_pq_topk: q20's broadcast-queries pattern over the ENCODED
  //    corpus (codes, not vectors) — linear scan by design, that is
  //    the ADC point.
  //  - q115_pq_refined: stage 1 IS q112's scan; stage 2 is candidate-
  //    bounded broadcast equi-joins (k·refine rows per query).
  //  - q113_ref_surprisal: the one-row reference-totals aggregate
  //    (total, V) crossJoins onto the aggregated (doc, term) stream.
  //  - q118_dsir_weights / q119_dsir_sample: q113's pattern twice — the
  //    TWO one-row LM-totals aggregates (target and reference)
  //    crossJoin onto the pool's aggregated (doc, term) stream.
  //  - q124_bm25: the one-row corpus-stats aggregate (N, avgdl, df per
  //    query term) crossJoins (broadcast) onto the per-doc stream.
  private val nestedLoopAllowed =
    Set("q72_cross", "q20_ann_topk", "q71_resample", "q79_skew",
      "q91_tfidf", "q92_knn", "q97_surprisal",
      "q106_quantize_int8", "q107_bigram_surprisal", "q108_mixture_plan",
      "q112_pq_topk", "q113_ref_surprisal", "q115_pq_refined",
      "q118_dsir_weights", "q119_dsir_sample", "q124_bm25",
      // q132: inherits q124's one-row totals broadcast + q20's
      // broadcast query-vector non-equi join; q133: one-row leak-audit
      // totals attach; q137: composes q20's truth retriever directly —
      // all the documented crossJoin(broadcast) shape
      "q132_rrf_fusion", "q133_leakage_split", "q137_ann_metrics",
      // q140/q141: tiny broadcast literal lists (thresholds, range
      // predicates) crossJoined against one scan — the documented
      // one-row-totals shape; q142: q20's broadcast query-vector
      // non-equi join with queries = the fixed 500-vector slice
      "q140_classifier_sweep", "q141_pruning_audit", "q142_knn_graph",
      // q143/q145: compose q142's broadcast-slice top-k; q144: the JL
      // audit's sampled-pair non-equi self-join on the fixed 400-slice
      // (the corpus-scale projection itself is map-side, pinned below)
      "q143_mutual_knn_clusters", "q144_random_projection",
      // q146: the grand-total one-row crossJoin(broadcast) attach
      "q145_knn_density", "q146_distinctive_terms",
      // q163: the two one-row snapshot-totals aggregates crossJoin
      // (broadcast) onto the category table — the q113 identity shape;
      // q164: q20's broadcast anchor-slice non-equi join (anchors are
      // the fixed bounded slice, the corpus streams map-side)
      "q163_share_drift", "q164_hard_negatives",
      // q165/q166: the one-row totals aggregate crossJoins (broadcast)
      // onto the class/bin table — the q113 identity shape again
      "q165_t_closeness", "q166_numeric_drift",
      // q175: the one-row doc-count aggregate crossJoins (broadcast)
      // onto the grid-sized config table (≤ a handful of rows)
      "q175_lsh_recommend")

  test("q171 (link graph): map-side extraction feeding one " +
      "aggregation pair, no join anywhere") {
    val p = plan("q171_link_graph")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"),
      s"extract→canonicalize→domain is scan→agg, no join:\n$p")
    assert(!p.contains("SortAggregate"),
      s"edge aggregation must stay hash-based:\n$p")
  }

  test("q168 (pca projection): the projection is map-side codegen, " +
      "zero exchanges") {
    val emb = io.Tables.embeddings(spark, dir)
    val (m, a) = graft.ext.Similarity.pcaBasis(
      emb, "vec_id", "embedding", dim = 64, k = 2)
    val p = graft.ext.Similarity.pcaProjectWith(
        emb, "vec_id", "embedding", 64, m, a)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(exchanges(p) === 0,
      s"pca projection must ride the scan, never shuffle:\n$p")
    assert(p.contains("mat_vec"), "expected the codegen matVec fold")
  }

  test("q144 (random projection): the projection itself is map-side, " +
      "zero exchanges") {
    val p = graft.ext.Similarity.randomProjection(
        io.Tables.embeddings(spark, dir), "vec_id", "embedding", 8)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(exchanges(p) === 0,
      s"mat_vec must ride the scan, never shuffle:\n$p")
    assert(p.contains("mat_vec"), "expected the codegen projection expr")
  }

  test("q114 (token chunks): pure map-side, zero exchanges") {
    assert(exchanges(plan("q114_token_chunks")) === 0,
      "window starts + chunk reassembly are array expressions in the scan")
  }

  test("q106 (int8 quantize): bounds broadcast back, corpus never shuffles") {
    val p = plan("q106_quantize_int8")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus side must meet the bounds only via broadcast:\n$p")
  }

  test("q109 (cdc chunks): no exchange partitions on the text column") {
    val p = plan("q109_cdc_chunks")
    // formatted explain puts each exchange's partitioning on its own
    // "Arguments: hashpartitioning(...)" line; the cdc text column is
    // aliased exactly `t`, so `t#<id>` appearing there (word-bounded —
    // `cnt#`/`count#` must not match) would mean raw text shuffling.
    // Chunking happens inside the scan: only d#/id# may key exchanges.
    val textKeyed = """hashpartitioning\([^)\n]*(?<![\w])t#\d""".r
      .findFirstIn(p)
    assert(textKeyed.isEmpty,
      s"an exchange partitions on the raw text column: $textKeyed\n$p")
    assert("""hashpartitioning\([^)\n]*\bd#\d""".r.findFirstIn(p).nonEmpty,
      s"the digest-count exchange should exist (else the pin went stale):\n$p")
  }

  test("q113 (ref surprisal): the one-row totals broadcast as identity") {
    val p = plan("q113_ref_surprisal")
    // the totals crossJoin broadcasts with IdentityBroadcastMode — a
    // plain `contains(BroadcastExchange)` would be satisfied by the
    // term join's HashedRelation broadcast and pin nothing
    assert(p.contains("IdentityBroadcastMode"),
      s"the one-row reference totals must broadcast (identity mode):\n$p")
  }

  test("q94 (nfc normalize): pure projection, zero exchanges") {
    assert(exchanges(plan("q94_nfc")) === 0,
      "normalization is codegen work inside the scan")
  }

  test("q95 (iqr outliers): fences broadcast back, big side never shuffles") {
    val p = plan("q95_iqr_outliers")
    assert(p.contains("BroadcastHashJoin"), s"fence join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the scan side must not shuffle into the fence join:\n$p")
  }

  test("q93 (shuffle shards): the only wide step is the per-shard window") {
    val p = plan("q93_shuffle_shards")
    assert(!p.contains("Join"), "shard layout must not join anything")
    // formatted explain prints the operator twice (tree + detail block)
    assert(exchanges(p) <= 2, "one exchange: the shard partition itself")
  }

  test("q61 (quantile buckets): no window operator, one aggregation") {
    val p = plan("q61_quantile_buckets")
    assert(!p.contains("Window"),
      s"bucketing must be a threshold chain, not a global-sort window:\n$p")
    assert(exchanges(p) <= 2, "threshold assignment is map-side")
  }

  test("q84 (pii scrub): pure projection, zero exchanges") {
    assert(exchanges(plan("q84_pii_scrub")) === 0,
      "pii redaction is regex work inside the scan")
  }

  test("q86 (decontamination): benchmark side broadcasts, corpus never shuffles on content") {
    val p = plan("q86_decontaminate")
    // both joins (digest semi + id join-back) must be broadcasts; the
    // only plain exchanges are the benchmark's own distinct and the
    // per-doc count agg — the corpus shingle stream itself never
    // shuffles. Formatted explain prints each operator TWICE (tree line
    // + numbered detail block), so two joins => count 4.
    assert(p.split("BroadcastHashJoin").length - 1 >= 4,
      s"both joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus shingles must not shuffle into a shuffled join:\n$p")
  }

  test("q117 (dpp): fact scan partition-prunes at runtime from the dim filter") {
    val p = plan("q117_dpp_join")
    // the hive-partitioned fact scan must carry a RUNTIME IN-filter on
    // its partition column, seeded by the region-filtered nation dim —
    // directory-level pruning, the scan mechanism that dominates on a
    // partitioned 100 TB lake
    assert(p.contains("PartitionFilters:"),
      s"fact must read a partitioned layout:\n$p")
    assert(p.contains("dynamicpruningexpression"),
      s"the dim filter must prune fact partitions dynamically:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the dim joins as a broadcast (DPP reuses its exchange):\n$p")
  }

  test("q121 (semdedup): centroid table broadcasts; pairing is an equi-join on cell") {
    // the final q121 plan sits downstream of the eager member
    // checkpoint (lineage truncated — SCALE.md round 7), so the join
    // shapes are pinned on the pre-checkpoint pair stage directly
    val emb = io.Tables.embeddings(spark, dir)
    val ctrs = Array.tabulate(16, 64) { (c, i) => (c * 64 + i) / 1024.0 }
    val scored = ext.Dedup.semDedupScored(emb, "vec_id", "embedding", ctrs)
    val p = ext.Dedup.semDedupPairs(scored, 0.45, None)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the centroid score join and the pair self-join must be hash joins
    // (on cell); a nested loop here would be the O(n²) failure mode the
    // k-means blocking exists to prevent
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"semdedup must never degrade to a nested loop:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 16-row centroid table must broadcast:\n$p")
  }

  test("q122 (bloom decontamination): the bloom gate rides the corpus scan") {
    val p = plan("q122_bloom_decontaminate")
    // the map-side bloom predicate must survive into the physical plan
    // as a filter — if a refactor drops it, the query silently becomes
    // the exact path (correct output, none of the scale win)
    assert(p.contains("bloom_might_contain"),
      s"bloom gate missing from the plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"confirm join must stay an equi-join:\n$p")
  }

  test("q128 (quality classifier): one codegen'd projection, zero exchanges") {
    val p = plan("q128_quality_classifier")
    assert(exchanges(p) === 0,
      s"classifier inference must be map-side only:\n$p")
    // the codegen expression (weights via addReferenceObj) must be the
    // scorer — a refactor to a UDF or a join-against-weights-table
    // would both lose the zero-shuffle shape
    assert(p.contains("hashed_ngram_score"),
      s"hashed_ngram_score expression missing from the plan:\n$p")
  }

  test("q129 (url canonical): pure projection, zero exchanges") {
    assert(exchanges(plan("q129_url_canonical")) === 0,
      "canonicalization + domain extraction is a map-side projection")
  }

  test("q127/q130 (char minhash, audio phash): fingerprints pinned once, " +
      "equi-joins only") {
    for (q <- Seq("q127_char_minhash", "q130_audio_phash_dedup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q: candidate pairing must stay an equi-join:\n$p")
      // both sides of the pairing must read the eager-checkpointed
      // signature/fingerprint frame (Scan ExistingRDD), not recompute
      // the shingle explode / WAV decode per consumer branch
      assert(p.contains("Scan ExistingRDD"),
        s"$q: pairing must read the pinned fingerprint frame:\n$p")
    }
  }

  test("q131 (heavy hitters): candidate prune is a broadcast semi-join; " +
      "only candidate terms reach the aggregation shuffle") {
    val p = plan("q131_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"candidate prune must broadcast, not shuffle the term stream:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a sort-merge prune would shuffle the full vocabulary:\n$p")
    // exactly one term-keyed shuffle (partial->final agg of candidates
    // only); the sketch pass is an already-executed RDD job outside
    // this plan. q86 counting convention: formatted explain prints
    // each node twice.
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2,
      s"expected a single candidate-only aggregation shuffle:\n$p")
  }

  test("q132 (rrf fusion): retriever top-ks are partial TakeOrdered, " +
      "never a global sort of the scored corpus") {
    val p = plan("q132_rrf_fusion")
    assert(p.contains("TakeOrderedAndProject"),
      s"rankTopK must plan as TakeOrderedAndProject:\n$p")
  }

  test("q134 (html extract): pure projection, zero exchanges") {
    assert(exchanges(plan("q134_html_extract")) === 0,
      "the extraction chain must stay inside the scan")
  }

  test("q149 (warc extract): record walk + extraction is one map-side " +
      "pass, zero exchanges") {
    assert(exchanges(plan("q149_warc_extract")) === 0,
      "build → record walk → extract must never shuffle (the keepCols " +
        "passthrough exists so no self-join re-attaches metadata)")
  }

  test("q151 (warc curation capstone): container → extract → gates → " +
      "dedup → shards composes as ONE plan — a single archive scan, " +
      "no join re-attaching flags or texts") {
    val p = plan("q151_warc_curation")
    // one documents scan: the gates ride the extraction projection
    // (keepCols) and the dedup survivor carries its stats through the
    // digest agg as plain mins, so nothing re-executes the WARC
    // lineage. q86 counting convention: formatted explain prints each
    // node twice (tree + detail).
    assert(p.split("Scan parquet").length - 1 === 2,
      s"the archive lineage must be scanned exactly once:\n$p")
    assert(!p.contains("Join"),
      s"no stage may self-join back onto the WARC lineage:\n$p")
    // exactly two shuffles: digest agg + final shard agg (the unused
    // shard-window row_number prunes away entirely)
    assert(p.split("Exchange hashpartitioning").length - 1 <= 4,
      s"expected digest-agg and shard-agg shuffles only:\n$p")
    assert(!p.contains("SortAggregate"),
      s"the digest agg must stay hash-based (no struct-min sort):\n$p")
  }

  // Formatted explain = tree section + one "(N) Operator" detail block
  // per node; this splits out the detail blocks so a test can assert on
  // ONE operator's expressions (e.g. a Filter's condition) instead of
  // the whole plan string.
  private def detailBlocks(p: String): Seq[String] =
    p.split("\n(?=\\(\\d+\\) )").toSeq

  test("q151/q103 observe fence: the quality-flag chain is NEVER " +
      "re-inlined into a Filter condition (the sf100 11-copy blowup)") {
    // Round 13's one genuine 100x defect: PushDownPredicates substitutes
    // alias definitions into filter conditions with no cost model, so
    // filter(keep) over qualityRules re-evaluated the html→text regex
    // chain ELEVEN times per row (640 of q151's 721 s at sf100). The
    // fence is a CollectMetrics node predicates cannot cross. The scan/
    // join/shuffle pins above CANNOT catch a recurrence — re-inlining
    // duplicates expressions INSIDE the single Filter node — so this
    // test pins the fix directly: (a) the fence node is present, (b) no
    // physical Filter condition contains the chain's signature
    // fragment, (c) the signature's total occurrence count stays at the
    // compute-once level. If a Spark upgrade starts pushing predicates
    // through CollectMetrics, this fails in CI, not at sf100.
    val cases = Seq(
      // (query, signature fragment unique to its expensive chain)
      ("q151_warc_curation", "<script"),        // htmlToText script-strip
      ("q103_curation", "[^a-zA-Z0-9 "))        // qualityRules punct class
    for ((q, sig) <- cases) {
      val p = plan(q)
      assert(p.contains("CollectMetrics"),
        s"$q: the optimizer fence (CollectMetrics) is gone from the plan")
      val filters = detailBlocks(p)
        .filter(_.matches("(?s)\\(\\d+\\) Filter(\\s|\\[).*"))
      assert(filters.nonEmpty, s"$q: expected Filter detail blocks")
      for (f <- filters)
        assert(!f.contains(sig),
          s"$q: a Filter condition contains the '$sig' chain — " +
            s"predicate re-inlining is back:\n$f")
      val n = p.sliding(sig.length).count(_ == sig)
      assert(n <= 4, s"$q: '$sig' appears $n times in the plan " +
        s"(compute-once level is <=4) — the chain is being duplicated")
    }
  }

  test("q135 (fuzzy join): blocking plans as an equi hash join, " +
      "never a cartesian distance sweep") {
    val p = plan("q135_fuzzy_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"blocked fuzzy join must not plan a product:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"),
      s"expected a hash-partitionable equi join on the block key:\n$p")
  }

  test("q154 (semantic decontamination): one codegen projection over " +
      "the corpus, zero exchanges — the benchmark rides as a constant") {
    val p = plan("q154_semantic_decontam")
    assert(exchanges(p) === 0,
      s"the matVec pass must not shuffle, got plan:\n$p")
    assert(!p.contains("Join"), "no join: the benchmark is a plan constant")
  }

  test("q158 (centrality sample): ranks broadcast, keep is map-side, " +
      "one aggregation pair on the domain key") {
    val p = plan("q158_centrality_sample")
    assert(p.contains("BroadcastHashJoin"),
      "graph-sized ranks must broadcast onto the corpus")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must never sort-merge against a graph-sized frame:\n$p")
  }

  test("q157/q159/q160/q161 (json profile, manifest, k-anon, l-div): " +
      "map-side prep, hash aggregation, no join anywhere") {
    Seq("q157_json_profile", "q159_shard_manifest", "q160_k_anonymity",
        "q161_l_diversity").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortAggregate"),
        s"$q must stay hash-aggregable:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("Join"),
        s"$q is scan→agg, no join:\n$p")
    }
  }

  test("no registered query plans a nested-loop join (allowlist excepted)") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(nestedLoopAllowed)
      .filter { q =>
        val p = plan(q)
        p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct")
      }
    assert(offenders.isEmpty,
      s"nested-loop join found in: ${offenders.mkString(", ")}")
  }
}
