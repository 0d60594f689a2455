package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality for corpus curation.
  *
  * The domain-level link graph is the classic web-curation quality
  * signal (Common Crawl publishes harmonic/PageRank centrality per
  * domain; curation recipes weight or gate crawl sources by it), and
  * it composes with the URL family: q129's registrable domains are the
  * nodes, page links the edges, and the centrality score joins back
  * onto documents as a per-source quality column — the graph twin of
  * the q124/q132 retrieval scores.
  *
  * The reference has no graph operators of any kind; this extends the
  * same extension surface as [[Dedup.connectedComponents]] (whose
  * size-gate / pinned-loop conventions it reuses).
  */
object Graphs {

  /** PageRank in FIXED-POINT integer arithmetic — deterministic,
    * order-independent, and bit-identically replayable by a SQL engine
    * (the q153 integer-AUC convention applied to an iterative
    * algorithm; float PageRank sums in shuffle order, so no two runs
    * — let alone two engines — agree at the ULP).
    *
    * Semantics: ranks carry `scale` units of total mass; per iteration
    * each node keeps
    * `base + danglingShare + Σ_in floor(num·pr(u) / (den·outdeg(u)))`
    * with `base = floor((den−num)·scale / (den·N))` and
    * `danglingShare = floor(num·D / (den·N))` where D is the summed
    * mass of zero-outdegree nodes — standard damped PageRank with
    * dangling redistribution at damping num/den (default 17/20 = 0.85),
    * every division a floor. Flooring leaks ≤ 1 unit per term per
    * round (≈ 10⁻¹² of the mass at the default scale): a deterministic
    * rounding-down of the true ranks, identical in every engine —
    * the price of exact cross-engine replay and exact driver≡cluster
    * equality, which float PageRank cannot offer at any price.
    *
    * Graph semantics: edges are DEDUPLICATED (unweighted PageRank;
    * multi-edges carry no extra mass), self-loops participate like any
    * edge, and null-endpoint edges are dropped BEFORE the size gate so
    * both gated paths see the identical graph (the
    * [[Dedup.connectedComponents]] rule). Fixed `iters` rounds, no
    * convergence test — an iteration count is part of the declared
    * semantics (PageRank@10), unlike a silent early-exit cap.
    *
    * Scale shape: the corpus-sized work is the edge DEDUPE (one
    * partial-aggregated distinct); everything after runs on the
    * node/edge tables. Below `maxDriverEdges` distinct edges the loop
    * runs on the driver (a sub-2M-edge graph's distributed rounds are
    * pure scheduling overhead — SCALE.md round 8), above it each round
    * is two shuffles over narrow (node, long) frames with the rank
    * state on a [[PinnedLoop]]; both paths produce BIT-IDENTICAL
    * output, which `GraphsSpec` pins.
    *
    * Output: (node, out_degree, rank_units, rank) — rank_units the
    * exact integer state, rank = rank_units/scale in one correctly-
    * rounded division.
    */
  def pageRankFixedPoint(edges: DataFrame, src: String, dst: String,
                         iters: Int = 10,
                         dampNum: Long = 17L, dampDen: Long = 20L,
                         scale: Long = 1000000000000L,
                         maxDriverEdges: Long = 2000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampNum > 0 && dampDen > dampNum,
      "damping num/den must satisfy 0 < num < den")
    require(scale >= 1000000L, "scale must carry enough fixed-point units")
    val spark = edges.sparkSession

    val e = edges
      .select(col(src).cast("long").as("src"), col(dst).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()

    // small-graph fast path: capped probe-collect, the CC convention
    val capped = e.limit(
      math.min(maxDriverEdges, Int.MaxValue - 2L).toInt + 1).collect()
    if (capped.length <= maxDriverEdges)
      return driverPageRank(spark,
        capped.map(r => (r.getLong(0), r.getLong(1))),
        iters, dampNum, dampDen, scale)

    distributedPageRank(e.localCheckpoint(), iters, dampNum, dampDen, scale)
  }

  /** The driver power iteration — the exact integer recurrence on
    * arrays. Public to the package so the spec can force it. */
  private[ext] def driverPageRank(spark: SparkSession,
                                  edges: Array[(Long, Long)],
                                  iters: Int, num: Long, den: Long,
                                  scale: Long): DataFrame = {
    require(edges.nonEmpty, "pageRankFixedPoint: empty graph")
    val ids = new java.util.TreeMap[Long, Int]() // node -> dense index
    edges.foreach { case (a, b) =>
      ids.putIfAbsent(a, 0); ids.putIfAbsent(b, 0)
    }
    var idx = 0
    val it0 = ids.entrySet().iterator()
    while (it0.hasNext) { it0.next().setValue(idx); idx += 1 }
    val n = idx
    val nodeOf = new Array[Long](n)
    val it1 = ids.entrySet().iterator()
    while (it1.hasNext) { val en = it1.next(); nodeOf(en.getValue) = en.getKey }
    val srcs = edges.map(t => ids.get(t._1))
    val dsts = edges.map(t => ids.get(t._2))
    val outdeg = new Array[Long](n)
    srcs.foreach(s => outdeg(s) += 1L)
    var pr = Array.fill(n)(scale / n)
    var round = 0
    while (round < iters) {
      var dangling = 0L
      var i = 0
      while (i < n) { if (outdeg(i) == 0L) dangling += pr(i); i += 1 }
      val base = (den - num) * scale / (den * n)
      val dshare = num * dangling / (den * n)
      val next = Array.fill(n)(base + dshare)
      var k = 0
      while (k < srcs.length) {
        next(dsts(k)) += num * pr(srcs(k)) / (den * outdeg(srcs(k)))
        k += 1
      }
      pr = next
      round += 1
    }
    import spark.implicits._
    (0 until n).map(i => (nodeOf(i), outdeg(i), pr(i),
        pr(i).toDouble / scale))
      .toDF("node", "out_degree", "rank_units", "rank")
  }

  /** The distributed power iteration: identical recurrence, rank state
    * pinned per round, edge/degree tables checkpointed once. */
  private def distributedPageRank(e: DataFrame, iters: Int,
                                  num: Long, den: Long,
                                  scale: Long): DataFrame = {
    val spark = e.sparkSession
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = true) // consumed every round
    val n = nodes.count()
    require(n > 0, "pageRankFixedPoint: empty graph")
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val nodeDeg = nodes.join(deg, Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("out_degree"), lit(0L)).as("out_degree"))
      .localCheckpoint(eager = true) // consumed every round, twice
    // (src, dst, outdeg): the per-round join input, built once
    val eDeg = e.join(nodeDeg.withColumnRenamed("node", "src"), Seq("src"))
      .select(col("src"), col("dst"), col("out_degree"))
      .localCheckpoint(eager = true)

    val base = (den - num) * scale / (den * n)
    var loop: PinnedLoop = null
    try {
      loop = PinnedLoop.start(
        nodes.select(col("node"), lit(scale / n).as("pr")))
      var round = 0
      while (round < iters) {
        val r = loop.current
        // dangling mass: one scalar off the pinned state (blocks, not
        // lineage — the L-BFGS one-row-per-evaluation shape)
        val dangling = r.join(nodeDeg, Seq("node"))
          .filter(col("out_degree") === 0L)
          .agg(coalesce(sum(col("pr")), lit(0L))).head().getLong(0)
        val dshare = num * dangling / (den * n)
        // integer DIV, never float division + cast: a double quotient
        // near 1e12 carries ULP error that truncates to the WRONG floor
        val inc = r.join(eDeg, col("node") === col("src"))
          .select(col("dst"),
            expr(s"($num * pr) div ($den * out_degree)").as("c"))
        val contrib = inc.groupBy(col("dst").as("node"))
          .agg(sum(col("c")).as("inc"))
        val next = nodes.join(contrib, Seq("node"), "left_outer")
          .select(col("node"),
            (lit(base + dshare) + coalesce(col("inc"), lit(0L))).as("pr"))
        loop.advance(next)
        round += 1
      }
      loop.finish()
        .join(nodeDeg, Seq("node"))
        .select(col("node"), col("out_degree"),
          col("pr").as("rank_units"),
          (col("pr").cast("double") / lit(scale.toDouble)).as("rank"))
    } finally if (loop != null) loop.release()
  }
}
