package graft.ext

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), BASELINE.json extension surface.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k, queries broadcast against
  *    the corpus. The per-query ranking is a window; [[topKAggregate]]
  *    computes the same result with a bounded-heap Aggregator whose
  *    partial (map-side) step caps every partition's contribution at k
  *    rows, so the shuffle is queries × partitions × k instead of
  *    queries × corpus — the shape you want at 10⁹ vectors.
  *  - [[lshCosineTopK]] — random-hyperplane LSH: deterministic
  *    hyperplanes (seeded), signature = sign-bit bucket per table; join
  *    corpus and queries on (table, bucket), exact-rank only the
  *    candidates. Candidate generation is linear in rows × tables.
  */
object Similarity {

  /** (id, v, norm) projection with the vector cast to double. */
  private def prep(df: DataFrame, id: String, vec: String,
                   idAs: String, vAs: String, nAs: String): DataFrame =
    df.select(col(id).as(idAs), col(vec).cast("array<double>").as(vAs))
      .withColumn(nAs, graft.functions.Vectors.norm(col(vAs)))

  private def dot(a: Column, b: Column): Column =
    graft.functions.Vectors.dot(a, b)

  /** Contrastive pair mining: per anchor, the nearest SAME-label
    * neighbor (the positive) and the nearest DIFFERENT-label neighbor
    * (the hard negative) with their cosines and the margin — the
    * triplet/InfoNCE training-pair generator for retrieval and
    * embedding fine-tuning, where random negatives are too easy to
    * teach anything and the near-boundary ones carry all the gradient.
    * A small (or negative) margin marks exactly the anchors worth
    * mining.
    *
    * Anchors are bounded by contract and broadcast (the
    * [[bruteForceTopK]] exact-twin convention — mine hard pairs for a
    * training SAMPLE; an all-corpus pairing belongs to the LSH/kNN
    * graph family). The corpus streams map-side, the per-(anchor,
    * side) rank-1 rows pivot through plain conditional aggregates
    * (single row per group side — hash-aggregable, the q151 rule). An
    * anchor whose label no other doc shares keeps null positive
    * columns rather than vanishing. Self-pairs are excluded by id.
    */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, id: String,
                    vec: String, label: String): DataFrame = {
    def side(df: DataFrame, idAs: String, vAs: String, nAs: String,
             lAs: String) =
      df.select(col(id).as(idAs), col(vec).cast("array<double>").as(vAs),
          col(label).as(lAs))
        .withColumn(nAs, graft.functions.Vectors.norm(col(vAs)))
    val c = side(corpus, "id", "v", "norm", "label")
    val q = side(anchors, "qid", "qv", "qnorm", "qlabel")
    val sims = c.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("id"),
        when(col("label") === col("qlabel"), 1).otherwise(0).as("same"),
        (dot(col("v"), col("qv")) / (col("norm") * col("qnorm")))
          .as("cosine"))
    val w = Window.partitionBy("qid", "same")
      .orderBy(col("cosine").desc, col("id").asc)
    sims.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("qid")
      .agg(min(col("qlabel")).as("label"),
        max(when(col("same") === 1, col("id"))).as("pos_id"),
        max(when(col("same") === 1, round(col("cosine"), 6)))
          .as("pos_cosine"),
        max(when(col("same") === 0, col("id"))).as("neg_id"),
        max(when(col("same") === 0, round(col("cosine"), 6)))
          .as("neg_cosine"))
      .withColumn("margin",
        round(col("pos_cosine") - col("neg_cosine"), 6))
  }

  /** Exact cosine top-k neighbors for each query vector.
    *
    * `queries` is expected to be small (it is broadcast); the corpus
    * streams map-side. Ties broken by neighbor id for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int): DataFrame = {
    val c = prep(corpus, id, vec, "id", "v", "norm")
    val q = prep(queries, id, vec, "qid", "qv", "qnorm")
    val sims = c.join(broadcast(q), col("id") =!= col("qid"))
      .withColumn("cosine", dot(col("v"), col("qv")) / (col("norm") * col("qnorm")))
      .select("qid", "id", "cosine")
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }

  /** Bounded top-k buffer (encoder-friendly Product wrapper). */
  final case class TopKBuf(items: Seq[(Long, Double)])

  /** Bounded top-k heap as a typed Aggregator over (qid, id, score): the
    * partial buffer never exceeds k entries, so map-side combine reduces
    * each partition's contribution to k rows per query before the
    * shuffle.
    */
  final class TopKAgg(k: Int)
      extends Aggregator[(Long, Long, Double), TopKBuf, TopKBuf] {
    private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
      s.sortBy { case (i, sc) => (-sc, i) }.take(k)
    override def zero: TopKBuf = TopKBuf(Vector.empty)
    // trim keeps the buffer sorted by (-score, id), so `items.last` is
    // the current k-th; a candidate that cannot displace it returns
    // the buffer UNCHANGED — O(1) for the common case instead of a
    // full O(k log k) re-sort + Vector alloc per input row (round-14
    // optimization; selection identical, ties included: an equal-score
    // higher-id candidate sorts after the k-th and take(k) drops it)
    override def reduce(b: TopKBuf, a: (Long, Long, Double)): TopKBuf =
      if (b.items.length >= k && {
        val (wi, ws) = b.items.last
        a._3 < ws || (a._3 == ws && a._2 >= wi)
      }) b
      else TopKBuf(trim(b.items :+ ((a._2, a._3))))
    override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
      TopKBuf(trim(x.items ++ y.items))
    override def finish(r: TopKBuf): TopKBuf = r
    override def bufferEncoder = Encoders.product[TopKBuf]
    override def outputEncoder = Encoders.product[TopKBuf]
  }

  /** Same result as [[bruteForceTopK]] via the bounded-heap Aggregator —
    * the shuffle-minimal shape for very large corpora.
    */
  def topKAggregate(corpus: DataFrame, queries: DataFrame,
                    id: String, vec: String, k: Int): DataFrame = {
    val c = prep(corpus, id, vec, "id", "v", "norm")
    val q = prep(queries, id, vec, "qid", "qv", "qnorm")
    val sims = c.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        (dot(col("v"), col("qv")) / (col("norm") * col("qnorm"))).as("cosine"))
    val spark = corpus.sparkSession
    import spark.implicits._
    sims.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn.name("topk"))
      .toDF("qid", "topk")
      .select(col("qid"), posexplode(col("topk.items")))
      .select(col("qid"), col("col._1").as("id"), col("col._2").as("cosine"),
        (col("pos") + 1).as("rank"))
  }

  /** Mark each directed edge of a (qid, id, cosine, rank) top-k edge
    * stream mutual iff the reverse edge is also present. The edge
    * stream is n·k rows — graph-sized, not corpus-sized — so the
    * self-join is cheap at any corpus size; (qid, id) pairs are unique
    * by construction (one rank per neighbor), so the left join cannot
    * fan out. */
  private def markMutual(e: DataFrame): DataFrame = {
    val rev = e.select(col("qid").as("m_dst"), col("id").as("m_src"))
    e.join(rev, col("qid") === col("m_src") && col("id") === col("m_dst"),
        "left")
      .withColumn("mutual", col("m_src").isNotNull.cast("int"))
      .select(col("qid").as("src"), col("id").as("dst"), col("cosine"),
        col("rank"), col("mutual"))
  }

  /** Exact k-nearest-neighbor GRAPH of a vector set: every node's
    * cosine top-k plus the `mutual` flag (reverse edge also in the
    * graph) — the primitive under graph-based curation: mutual-kNN
    * clustering, diversity sampling, and kth-NN density/outlier
    * scoring all read this edge list.
    *
    * Exact all-pairs is inherently n² — this is the audit twin, bound
    * to broadcast-scale slices (the q77 fixed-slice convention for
    * exact pairwise ops); the corpus-scale path is [[knnGraphLsh]],
    * whose recall is measured against THIS on a shared slice
    * (SimilaritySpec). Shuffle shape: the bounded-heap Aggregator —
    * ≤ k rows per node per partition move, never the n² candidate
    * stream. */
  def knnGraph(df: DataFrame, id: String, vec: String, k: Int): DataFrame =
    markMutual(topKAggregate(df, df, id, vec, k))

  /** [[knnGraph]] at corpus scale: candidates only within shared
    * sign-LSH buckets (md5 plane family — engine-replayable), hot
    * buckets dropped by `maxBucketSize` (the LSH skew cap: a bucket
    * over the cap contributes pairs quadratically and signal-poorly —
    * same convention as the blocked cosine pairs), then the
    * bounded-heap top-k per node and the mutual mark.
    *
    * Nothing broadcasts the vector set: candidate generation is an
    * equi self-join on (table, bucket), vectors attach to the
    * candidate stream at STORED width by two equi joins and are cast
    * to double only inside the dot (the narrow-candidate-stream
    * rule). Nodes whose buckets were all dropped by the cap have no
    * edges (honest output, like the capped pair ops). The bucket
    * stream is consumed by the size aggregation and both sides of the
    * candidate join — one eager checkpoint (multi-consumer rule). */
  def knnGraphLsh(df: DataFrame, id: String, vec: String, k: Int,
                  tables: Int = 16, nPlanes: Int = 8, dim: Int = 64,
                  maxBucketSize: Option[Long] = Some(1000)): DataFrame = {
    val ps = md5SignPlanes(tables, nPlanes, dim)
    val b0 = bucketsFromPlanes(df, id, vec, ps).localCheckpoint(true)
    val b = maxBucketSize match {
      case Some(cap) =>
        val keep = b0.groupBy("table", "bucket")
          .agg(count(lit(1)).as("bsz"))
          .filter(col("bsz") <= cap).select("table", "bucket")
        // the equi-join puts the join keys FIRST (table, bucket, id) —
        // re-select to the (id, table, bucket) contract before the
        // positional renames below, or qid/bucket swap roles silently
        b0.join(keep, Seq("table", "bucket")).select("id", "table", "bucket")
      case None => b0
    }
    val cand = b.toDF("qid", "table", "bucket")
      .join(b.toDF("id", "table", "bucket"), Seq("table", "bucket"))
      .filter(col("id") =!= col("qid"))
      .select("qid", "id").distinct()
    val craw = df.select(col(id).cast("long").as("id"), col(vec).as("_cv"))
    val qraw = df.select(col(id).cast("long").as("qid"), col(vec).as("_qv"))
    val cv = col("_cv").cast("array<double>")
    val qv = col("_qv").cast("array<double>")
    val sims = cand.join(craw, Seq("id")).join(qraw, Seq("qid"))
      .select(col("qid"), col("id"),
        (dot(cv, qv) / (graft.functions.Vectors.norm(cv) *
          graft.functions.Vectors.norm(qv))).as("cosine"))
    val spark = df.sparkSession
    import spark.implicits._
    val topk = sims.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn.name("topk"))
      .toDF("qid", "topk")
      .select(col("qid"), posexplode(col("topk.items")))
      .select(col("qid"), col("col._1").as("id"), col("col._2").as("cosine"),
        (col("pos") + 1).as("rank"))
    markMutual(topk)
  }

  /** Mutual-kNN clustering: connected components of the UNDIRECTED
    * graph whose edges are the kNN graph's mutual pairs (a in b's
    * top-k AND b in a's top-k) — the structure under diversity-aware
    * curation and prototype selection: mutual edges require agreement
    * from both endpoints, so a hub that happens to be many nodes'
    * neighbor does not glue unrelated regions together the way raw
    * kNN edges (or a plain cosine threshold) do.
    *
    * Every input node gets a row; nodes with no mutual edge are
    * singleton clusters under their own id (the q80 coalesce pattern).
    * Exact all-pairs is inherently n² — this form is the audit twin on
    * fixed broadcast-scale slices; [[mutualKnnClustersLsh]] is the
    * corpus path. Component labeling is [[Dedup.connectedComponents]]:
    * size-gated driver union-find below 2M edges, pinned flat rounds
    * above, fail-loud on non-convergence. The mutual edge list is at
    * most n·k/2 rows — graph-sized, never corpus-quadratic. */
  def mutualKnnClusters(df: DataFrame, id: String, vec: String,
                        k: Int): DataFrame =
    clustersFromEdges(df, id, knnGraph(df, id, vec, k))

  /** [[mutualKnnClusters]] at corpus scale: edges from [[knnGraphLsh]]
    * (capped sign-LSH buckets, nothing broadcasts). LSH may miss true
    * neighbors, so mutual edges — and therefore clusters — are a
    * recall-bounded subset; SimilaritySpec measures cluster agreement
    * against the exact twin on planted clusters. */
  def mutualKnnClustersLsh(df: DataFrame, id: String, vec: String, k: Int,
                           tables: Int = 16, nPlanes: Int = 8, dim: Int = 64,
                           maxBucketSize: Option[Long] = Some(1000)): DataFrame =
    clustersFromEdges(df, id,
      knnGraphLsh(df, id, vec, k, tables, nPlanes, dim, maxBucketSize))

  private def clustersFromEdges(df: DataFrame, id: String,
                                graph: DataFrame): DataFrame = {
    val pairs = graph.filter(col("mutual") === 1 && col("src") < col("dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"))
    val comp = Dedup.connectedComponents(pairs)
    df.select(col(id).cast("long").as("id"))
      .join(comp, Seq("id"), "left_outer")
      .select(col("id").as(id),
        coalesce(col("component"), col("id")).as("cluster"))
  }

  /** kth-NN density score: each node's cosine to its kth nearest
    * neighbor — high means the node sits in a dense region (near-dup
    * mass, boilerplate clusters), low means isolated (outliers,
    * frontier examples). The signal under density-based pruning
    * (SemDeDup-style keep-one-per-dense-region) and
    * hardest-example mining.
    *
    * Nodes with fewer than k neighbors report null (honest, not a
    * silently-smaller k). Shuffle shape: the bounded-heap Aggregator —
    * ≤ k rows per node per partition, never the n² candidate stream;
    * exact form for broadcast-scale slices (the corpus path blocks
    * candidates with LSH exactly like [[knnGraphLsh]] — density only
    * needs the kth edge, so any top-k path feeds it). */
  def knnDensity(df: DataFrame, id: String, vec: String, k: Int): DataFrame = {
    val kth = topKAggregate(df, df, id, vec, k)
      .filter(col("rank") === k)
      .select(col("qid").as("id"), col("cosine").as("kth_cosine"))
    df.select(col(id).cast("long").as("id"))
      .join(kth, Seq("id"), "left_outer")
      .select(col("id").as(id), col("kth_cosine"))
  }

  /** Deterministic ±1/√outDim sign matrix from the md5 family — the
    * sparse Johnson–Lindenstrauss projection (Achlioptas '03: ±1
    * entries satisfy the JL guarantee with the same constants as
    * Gaussian). Same derivation convention as [[md5SignPlanes]], so
    * the oracle generator embeds the identical literals. */
  def md5SignMatrix(outDim: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim, dim) { (j, i) =>
      val d = md.digest(s"proj:$j:$i".getBytes("UTF-8"))
      if (((d(0) >> 4) & 1) == 0) scale else -scale
    }
  }

  /** Random-projection dimensionality reduction: map each embedding to
    * `outDim` dims through the deterministic ±1/√outDim JL matrix —
    * the cheap way to make every downstream ANN/pairwise stage pay
    * outDim/dim of its dot-product and shuffle cost while keeping
    * pairwise distances within JL distortion (audited pairwise by the
    * board query and SimilaritySpec, not assumed).
    *
    * Scale shape: pure map-side codegen ([[graft.functions.Vectors.matVec]],
    * matrix as a reference object) over the stored float32 column —
    * zero shuffle, zero pre-cast, composes with any downstream index
    * build. */
  def randomProjection(df: DataFrame, id: String, vec: String,
                       outDim: Int, dim: Int = 64): DataFrame =
    df.select(col(id).cast("long").as(id),
      graft.functions.Vectors.matVec(col(vec),
        md5SignMatrix(outDim, dim)).as("proj"))

  /** Exact PCA basis over an embedding column: the data-adapted
    * counterpart of [[randomProjection]] (JL preserves distances
    * obliviously; PCA concentrates VARIANCE, the right reduction
    * before clustering/SemDeDup when the corpus has structure). One
    * distributed covariance pass (`RowMatrix.computePrincipalComponents`
    * — covariance via one treeAggregate, eigendecomposition of the
    * dim×dim Gram on the driver: dim is 64-1024 for embeddings, the
    * classic tall-skinny shape) plus one column-means pass. Returns
    * `(means, axes)` with axes as k rows × dim cols, each axis
    * sign-canonicalized (largest-|entry| component positive, index
    * tiebreak low) so the basis is unique, not SVD-sign-arbitrary.
    *
    * Float covariance sums are shuffle-order-dependent, so the basis
    * is captured per run and REPLAYED as literals (the q40/q110
    * captured-params convention) — never recomputed by an oracle.
    */
  def pcaBasis(df: DataFrame, id: String, vec: String, dim: Int,
               k: Int): (Array[Double], Array[Array[Double]]) = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val noNulls = prep(df, id, vec, "id", "v", "norm")
      .filter(col("v").isNotNull && !exists(col("v"), x => x.isNull) &&
        size(col("v")) === dim)
    val rows = noNulls.select("v").rdd
      .map(r => org.apache.spark.mllib.linalg.Vectors.dense(
        r.getSeq[Double](0).toArray))
    val mat = new org.apache.spark.mllib.linalg.distributed.RowMatrix(rows)
    val means = mat.computeColumnSummaryStatistics().mean.toArray
    val pc = mat.computePrincipalComponents(k) // dim × k, column-major
    val axes = Array.tabulate(k, dim)((j, i) => pc(i, j))
    axes.foreach { a =>
      val pivot = a.indices.maxBy(i => (math.abs(a(i)), -i))
      if (a(pivot) < 0) a.indices.foreach(i => a(i) = -a(i))
    }
    (means, axes)
  }

  /** The per-axis centering constants `c_j = <means, axis_j>` — ONE
    * shared derivation (ascending-index fold) so the Spark plan and a
    * generated oracle consume bit-identical literals. */
  def pcaCenters(means: Array[Double],
                 axes: Array[Array[Double]]): Array[Double] =
    axes.map(a => means.indices.foldLeft(0.0)((s, i) => s + means(i) * a(i)))

  /** Project an embedding column onto a captured PCA basis: per axis
    * `pc_j = snap6( <v, axis_j> − c_j )` with `c_j = <means, axis_j>`
    * folded into one driver-side literal — the centering never touches
    * the per-row hot path, and the inner product is the same codegen'd
    * ascending-index fold [[randomProjection]] uses
    * ([[graft.functions.Vectors.matVec]]), replayed verbatim by
    * DuckDB's `list_inner_product`. Pure map-side, zero shuffle.
    * Malformed vectors (null, wrong length, null element) are dropped,
    * matching the basis estimation filter.
    */
  def pcaProjectWith(df: DataFrame, id: String, vec: String, dim: Int,
                     means: Array[Double],
                     axes: Array[Array[Double]]): DataFrame = {
    require(axes.nonEmpty && axes.forall(_.length == dim),
      "axes must be k rows of dim cols")
    require(means.length == dim, "means must have dim entries")
    val centers = pcaCenters(means, axes)
    val snap6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    // the id keeps its ORIGINAL type (crossContainmentGate convention):
    // a long cast would silently null non-numeric ids for future callers
    df.filter(col(vec).isNotNull &&
        !exists(col(vec), x => x.isNull) && size(col(vec)) === dim)
      .select(col(id) +:
        axes.indices.map { j =>
          snap6(element_at(graft.functions.Vectors.matVec(col(vec),
            Array(axes(j))), 1) - lit(centers(j))).as(s"pc${j + 1}")
        }: _*)
  }

  /** k-NN label prediction: each query's label is the majority label of
    * its k nearest corpus neighbors by cosine; vote ties break to the
    * smaller label, so classification is deterministic.
    *
    * Scale shape: the neighbor stage is [[topKAggregate]] — the
    * bounded-heap plan whose shuffle is queries × partitions × k, never
    * queries × corpus — and corpus labels join onto the resulting TINY
    * (queries × k) stream, not the other way round. The vote itself is
    * one aggregation plus a per-query window over ≤ distinct-labels
    * rows. To classify against a billion-row corpus, swap the neighbor
    * stage for [[signLshCosineTopK]] or [[ivfCosineTopK]]; the vote is
    * unchanged.
    */
  def knnClassify(corpus: DataFrame, queries: DataFrame, id: String,
                  vec: String, label: String, k: Int): DataFrame = {
    val topk = topKAggregate(corpus, queries, id, vec, k)
    val labels = corpus.select(col(id).as("id"), col(label).as("nlabel"))
    val votes = topk.join(labels, Seq("id"))
      .groupBy("qid", "nlabel").agg(count(lit(1)).as("votes"))
    // asc_nulls_last: a NULL label is a legal vote group, but Spark's
    // plain asc sorts nulls FIRST while SQL engines sort them LAST
    // (CLAUDE.md) — on a vote tie the two would disagree
    val w = Window.partitionBy("qid")
      .orderBy(col("votes").desc, col("nlabel").asc_nulls_last)
    votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), col("nlabel").as("predicted_label"), col("votes"))
  }

  /** Element-wise mean vector per `label` group, exploded to
    * (label, dim, value) rows. The distributed centroid computation
    * underlying IVF cell refresh, class prototypes, and embedding-drift
    * monitoring: posexplode is map-side, the aggregation partial-combines
    * per (label, dim), so the shuffle carries at most
    * labels × dim × partitions rows regardless of corpus size.
    */
  def labelCentroids(df: DataFrame, vec: String, label: String): DataFrame =
    df.filter(col(vec).isNotNull)
      .select(col(label).as("label"),
        posexplode(col(vec).cast("array<double>")))
      .groupBy(col("label"), col("pos").as("dim"))
      .agg(avg(col("col")).as("value"))

  /** [[labelCentroids]] reassembled to one `array<double>` per label
    * (for downstream broadcast as quantizer cells). */
  def labelCentroidVectors(df: DataFrame, vec: String, label: String): DataFrame =
    labelCentroids(df, vec, label)
      .groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("value")))),
        s => s.getField("value")).as("centroid"))

  /** [[labelCentroidVectors]] keyed by MULTIPLE columns (e.g.
    * (label, corpus-slice)): one corpus scan computes every group's
    * centroid — the shape a drift monitor needs, instead of one scan
    * per slice. Same partial-combine discipline: at most
    * groups × dim × partitions rows shuffle.
    */
  def centroidVectorsBy(df: DataFrame, vec: String,
                        keys: Seq[String]): DataFrame =
    df.filter(col(vec).isNotNull)
      .select(keys.map(col) :+
        posexplode(col(vec).cast("array<double>")): _*)
      .groupBy((keys :+ "pos").map(col): _*)
      .agg(avg(col("col")).as("v"))
      .groupBy(keys.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("centroid"))

  /** Embedding-drift monitor: per-label centroid cosine between the
    * even and odd `id`-parity slices of a corpus — the
    * distribution-shift check run before a corpus refresh ships.
    *
    * ONE scan computes every (label, parity) centroid
    * ([[centroidVectorsBy]]); the FULL OUTER join on label means a
    * label present in only one slice — the strongest drift signal —
    * reports with a NULL cosine instead of silently vanishing (an
    * inner join would be blind to exactly the label that changed
    * most). `%`, not pmod: sign-preserving remainder matches SQL
    * engines, so negative ids are excluded identically everywhere.
    */
  def centroidDrift(df: DataFrame, id: String, vec: String,
                    label: String): DataFrame = {
    val cent = centroidVectorsBy(
        df.withColumn("par", col(id) % 2).filter(col("par").isin(0, 1)),
        vec, Seq(label, "par"))
      .localCheckpoint(eager = true) // tiny; feeds both join sides
    val ca = cent.filter(col("par") === 0)
      .select(col(label), col("centroid").as("ca"))
    val cb = cent.filter(col("par") === 1)
      .select(col(label), col("centroid").as("cb"))
    ca.join(cb, Seq(label), "full_outer")
      .select(col(label),
        when(col("ca").isNotNull && col("cb").isNotNull,
          round(graft.functions.Vectors.cosine(col("ca"), col("cb")), 6))
          .as("centroid_cosine"))
  }

  /** Deterministic random hyperplanes: tables × planes × dim, seeded. */
  private def planes(tables: Int, nPlanes: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new Random(seed)
    Array.fill(tables, nPlanes, dim)(rnd.nextGaussian())
  }

  /** Plane count that keeps expected sign-LSH bucket occupancy at
    * `targetOccupancy` as the corpus grows: the smallest b >= minPlanes
    * with 2^b >= ceil(n / targetOccupancy). A FIXED plane count is the
    * hidden super-linear term in LSH blocking — 10x the rows at the
    * same 2^b buckets means 10x the occupancy and 100x the candidate
    * pairs per bucket (measured: q104 went 22.6x for 10x data at b=8
    * before this; ~6x after). Integer-exact on purpose: the DuckDB
    * oracle replays the same formula as
    * `greatest(minPlanes, length(ltrim(bin((cnt+occ-1)//occ - 1),'0')))`
    * and a float log2 disagrees with Scala's at exact powers of two.
    * Recall trade: more planes thin each bucket, but a TRUE near-dup
    * pair (cosine -> 1) collides per-plane with prob 1 - theta/pi -> 1,
    * so multi-table recall on actual duplicates stays ~1 while
    * mid-similarity noise pairs drop out — the desirable direction for
    * a dedup blocker.
    */
  def adaptivePlanes(n: Long, minPlanes: Int = 8,
                     targetOccupancy: Long = 16L): Int = {
    require(minPlanes >= 1 && targetOccupancy >= 1)
    val m = math.max((n + targetOccupancy - 1) / targetOccupancy, 1L)
    val ceilLog2 = if (m <= 1L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.max(minPlanes, ceilLog2)
  }

  /** Constant-occupancy k-means cell count for cluster-blocked
    * operators ([[graft.ext.Dedup.semDedupWith]]) — the same audit rule
    * [[adaptivePlanes]] answers for sign-LSH (SCALE.md round 8: "any
    * operator whose blocking granularity is a fixed constant must
    * derive it from n or cap the per-block pair budget"). Within-cell
    * pairing costs ~occupancy²/2 per cell, so a FIXED cell count makes
    * total pair work quadratic in n; cells = ceil(n/occupancy) pins
    * expected occupancy — and with it the per-cell pair budget — at any
    * corpus size (total pairs ~ n·occupancy/2, linear in n). The
    * default occupancy is calibrated so the oracle SFs (≤20k vectors)
    * keep the historical 16 cells — board outputs stay byte-identical.
    *
    * Flat k-means training is practical to ~1e5 cells (each Lloyd
    * iteration is O(sample·k·dim)); beyond that a hierarchical /
    * two-level coarse quantizer is the standard construction (as in
    * FAISS' IVF_HNSW) — the formula still gives the right leaf count.
    */
  def adaptiveCells(n: Long, minCells: Int = 16,
                    targetOccupancy: Long = 1250L): Int = {
    require(minCells >= 1 && targetOccupancy >= 1)
    val k = (n + targetOccupancy - 1) / targetOccupancy
    math.max(minCells.toLong, k).min(Int.MaxValue).toInt
  }

  /** Rademacher ±1 hyperplanes derived from md5("t:p:i") — a valid
    * sign-random-projection family (Achlioptas sparse projections) whose
    * construction any engine with md5 can replay: sign = +1 iff the high
    * nibble of the digest's first byte is even. This is what lets a
    * DuckDB oracle recompute the exact same buckets in SQL (q19).
    */
  def md5SignPlanes(tables: Int, nPlanes: Int, dim: Int): Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables, nPlanes, dim) { (t, p, i) =>
      val d = md.digest(s"$t:$p:$i".getBytes("UTF-8"))
      if (((d(0) >> 4) & 1) == 0) 1.0 else -1.0
    }
  }

  /** Sign-bit bucket ids over the given hyperplanes: (id, table, bucket). */
  private def bucketsFromPlanes(df: DataFrame, id: String, vec: String,
                                ps: Array[Array[Array[Double]]]): DataFrame = {
    // ONE codegen expression for all tables×planes dots: the expanded
    // per-plane formulation inlined tables×planes×dim literal doubles
    // into the generated Java — ~8 s of one-time JIT for the 16×8×64
    // default (measured; see SignLshBucketsExpr). Same math, same
    // accumulation order, bit-identical buckets.
    val v = col(vec).cast("array<double>")
    // null vectors keep the historical (oracle-replayed) contract:
    // bucket 0 in every table — the expression is null-propagating and
    // posexplode(null) would silently DROP the id instead
    val zeros = array(Seq.fill(ps.length)(lit(0L)): _*)
    df.select(col(id).as("id"),
        posexplode(coalesce(
          graft.functions.Vectors.signLshBuckets(v, ps), zeros)))
      .toDF("id", "table", "bucket")
  }

  /** Sign-bit bucket ids, one per table: (id, table, bucket). */
  def lshBuckets(df: DataFrame, id: String, vec: String,
                 tables: Int = 8, nPlanes: Int = 12, dim: Int = 64,
                 seed: Long = 42L): DataFrame =
    bucketsFromPlanes(df, id, vec, planes(tables, nPlanes, dim, seed))

  /** [[lshBuckets]] with the engine-replayable [[md5SignPlanes]] family. */
  def signLshBuckets(df: DataFrame, id: String, vec: String,
                     tables: Int = 16, nPlanes: Int = 8, dim: Int = 64): DataFrame =
    bucketsFromPlanes(df, id, vec, md5SignPlanes(tables, nPlanes, dim))

  /** IVF (inverted-file) ANN top-k: a k-means coarse quantizer
    * partitions the corpus into `nCells` cells; each query exact-ranks
    * only the `nProbe` nearest cells' members. The complement of
    * [[lshCosineTopK]]: IVF adapts to the data distribution (cells =
    * learned clusters) where LSH is data-oblivious; both reduce
    * per-query cost from |corpus| to a candidate subset.
    *
    * The quantizer trains on a deterministic hash-sample of the corpus
    * (`trainFraction`) via MLlib KMeans (seeded): a COARSE quantizer
    * only needs cells that carve the space, and a sample sees the same
    * distribution at a fraction of the per-iteration cost — at 100 TB
    * training the quantizer on the full corpus would be 10 scans of
    * everything. The sample is cached for the iterations and unpersisted
    * once the centroids are extracted; assignment is a broadcast of
    * `nCells` centroids, so ranking stays fully distributed map-side
    * work + one top-k. Falls back to the full corpus when the sample is
    * too small to seat `nCells` clusters (tiny inputs / tests).
    *
    * Default `nProbe` = 8 of 16 cells: on near-random 64-dim data (the
    * hardest case — cell boundaries carve little cosine structure)
    * recall@10 measured 0.54/0.80/0.94/0.98 at nProbe 4/6/8/10, and the
    * library default must clear the 0.9 floor [[SimilaritySpec]] pins.
    * Clustered real-embedding corpora reach the same recall at lower
    * nProbe; tune DOWN for those, not up from here.
    */
  /** Train the IVF coarse-quantizer centroids on a hash-sample of the
    * corpus (seeded, deterministic — capturable for SQL oracle replay,
    * like [[trainPqCodebooks]]). */
  def trainIvfCentroids(corpus: DataFrame, id: String, vec: String,
                        nCells: Int = 16, trainFraction: Double = 0.25,
                        seed: Long = 42L, dim: Int = -1): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    // valid rows only (the pqRows rule, matching the search-path
    // filters): one malformed vector in the train sample would crash
    // the KMeans fit. Callers that know the corpus dim pass it; the
    // default infers the MODAL vector size (one aggregate job, cold
    // path — board call sites pass dim) so a single wrong-dimension
    // first row can't silently filter out the well-formed majority.
    val noNulls = prep(corpus, id, vec, "id", "v", "norm")
      .filter(col("v").isNotNull && !exists(col("v"), x => x.isNull))
    val d = if (dim > 0) dim
            else noNulls.groupBy(size(col("v")).as("__d"))
              .count().orderBy(col("count").desc, col("__d").asc)
              .head(1).headOption.map(_.getInt(0)).getOrElse(
                throw new IllegalArgumentException(
                  "trainIvfCentroids: no null-free vectors to infer dim " +
                    "from; pass dim explicitly"))
    val c = noNulls.filter(size(col("v")) === d)
      .withColumn("features", array_to_vector(col("v")))
    val minTrain = nCells * 4L
    val trainSet = {
      val s =
        if (trainFraction >= 1.0) c
        else Sampling.hashSample(c, "id", trainFraction)
      // limit-bounded existence check: one cheap early-exit scan, never
      // a full count of the corpus
      if (s.limit(minTrain.toInt).count() >= minTrain) s else c
    }
    trainSet.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // 5 iterations: a COARSE quantizer only carves space — recall on
    // real embeddings is identical to 10 iters (spec floor holds) and
    // each saved iteration is a full pass over the training sample
    val km = new KMeans().setK(nCells).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("features")
    val model =
      try km.fit(trainSet)
      finally trainSet.unpersist(blocking = false) // even on a failed fit
    model.clusterCenters.map(_.toArray)
  }

  def ivfCosineTopK(corpus: DataFrame, queries: DataFrame,
                    id: String, vec: String, k: Int,
                    nCells: Int = 16, nProbe: Int = 8,
                    trainFraction: Double = 0.25,
                    seed: Long = 42L): DataFrame =
    ivfCosineTopKWith(corpus, queries, id, vec, k, nProbe,
      trainIvfCentroids(corpus, id, vec, nCells, trainFraction, seed))

  /** [[ivfCosineTopK]] against caller-supplied centroids (see
    * [[pqQuantizeWith]] for why the split exists). */
  def ivfCosineTopKWith(corpus: DataFrame, queries: DataFrame,
                        id: String, vec: String, k: Int, nProbe: Int,
                        centroids: Array[Array[Double]]): DataFrame = {
    // valid rows only, BOTH sides (the pqRows rule): without the
    // filter one malformed vector throws inside ivf_cells and kills
    // the whole corpus scan; the q40 oracle mirrors the filter
    val dim = centroids(0).length
    def valid(v: Column): Column =
      size(v) === dim && !exists(v, x => x.isNull)
    val c = prep(corpus, id, vec, "id", "v", "norm")
      .filter(valid(col("v")))

    // assignment / probing = the ivf_cells codegen expression
    // (centroids ride addReferenceObj, not 1k inlined literals;
    // same (dist, cell) order as the old sorted-struct form)
    val assigned = c.select(col("id"), col("v"), col("norm"),
      element_at(graft.functions.Pq.ivfCells(col("v"), centroids, 1), 1)
        .as("cell"))
    val q = prep(queries, id, vec, "qid", "qv", "qnorm")
      .filter(valid(col("qv")))
      .select(col("qid"), col("qv"), col("qnorm"),
        explode(graft.functions.Pq.ivfCells(col("qv"), centroids, nProbe))
          .as("cell"))

    val sims = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      // NULL, not 0/0 — the pqCosineTopK NaN-rank rule (a zero-norm
      // vector would take rank 1 AND floor-snap to a fake 0.0 in the
      // dump while the oracle keeps NaN)
      .withColumn("cosine",
        when(col("norm") * col("qnorm") > 0,
          dot(col("v"), col("qv")) / (col("norm") * col("qnorm"))))
      .select("qid", "id", "cosine")
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }

  /** ANN top-k: LSH-bucket join for candidates, exact cosine rank on the
    * candidate set only. Recall grows with `tables`; cost per query is
    * the candidate set size, not the corpus.
    */
  def lshCosineTopK(corpus: DataFrame, queries: DataFrame,
                    id: String, vec: String, k: Int,
                    tables: Int = 8, nPlanes: Int = 12, dim: Int = 64,
                    seed: Long = 42L): DataFrame =
    lshTopKWithPlanes(corpus, queries, id, vec, k,
      planes(tables, nPlanes, dim, seed))

  /** [[lshCosineTopK]] over the engine-replayable [[md5SignPlanes]]
    * family — identical ANN shape, but a SQL oracle can regenerate the
    * buckets and therefore the exact result set (q21). */
  def signLshCosineTopK(corpus: DataFrame, queries: DataFrame,
                        id: String, vec: String, k: Int,
                        tables: Int = 12, nPlanes: Int = 4,
                        dim: Int = 64): DataFrame =
    lshTopKWithPlanes(corpus, queries, id, vec, k,
      md5SignPlanes(tables, nPlanes, dim))

  private def lshTopKWithPlanes(corpus: DataFrame, queries: DataFrame,
                                id: String, vec: String, k: Int,
                                ps: Array[Array[Array[Double]]]): DataFrame = {
    val cb = bucketsFromPlanes(corpus, id, vec, ps)
    val qb = bucketsFromPlanes(queries, id, vec, ps)
      .toDF("qid", "table", "bucket")
    val candIds = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("id") =!= col("qid"))
      .select("qid", "id").distinct()
    val c = prep(corpus, id, vec, "id", "v", "norm")
    val q = prep(queries, id, vec, "qid", "qv", "qnorm")
    val sims = candIds
      .join(c, Seq("id"))
      .join(broadcast(q), Seq("qid"))
      .withColumn("cosine", dot(col("v"), col("qv")) / (col("norm") * col("qnorm")))
      .select("qid", "id", "cosine")
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("id").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }

  // --------------------------------------------------------------------
  // Product quantization (PQ codebook compression)
  // --------------------------------------------------------------------

  /** Product-quantization encode + reconstruction audit: the vector
    * splits into `m` contiguous subvectors, each subspace trains its own
    * `k`-codeword k-means codebook (on a hash-sample, like the IVF
    * quantizer — never a full corpus pass per subspace), and every
    * vector encodes to `m` small codes — m·log₂k bits instead of 32·dim
    * (m=8, k=16: 4 bytes vs 256, the compression that puts 10⁹ vectors
    * in RAM where [[quantizeInt8]]'s 4× cannot). Output: `codes` plus
    * the same reconstruction metrics as [[quantizeInt8]] (`mse`,
    * `cos_q` vs the codebook reconstruction) so the rate/distortion
    * trade is measured, not assumed.
    *
    * Scale shape: training touches only the sample (m driver-sequenced
    * k-means fits, each over sample × sub dims — the documented
    * iterative-trainer pattern, like BPE); encoding is a map-side
    * native-expression argmin ([[graft.functions.PqEncodeExpr]]) whose
    * codebooks enter generated code via `ctx.addReferenceObj`, never as
    * inlined literals (SCALE.md codegen lesson), so the corpus is
    * scanned once and never shuffles.
    *
    * k-means is not SQL-expressible, but the trained codebooks ARE
    * capturable: the board entry replays encode/reconstruct against the
    * captured books in SQL (full hash oracle, not rows-only), and
    * determinism/reconstruction quality are additionally spec-asserted
    * ([[SimilaritySpec]]).
    */
  /** Train the per-subspace PQ codebooks on a hash-sample of `df` —
    * shared by [[pqQuantize]] (compression audit) and [[pqCosineTopK]]
    * (ADC search). Returns m codebooks of k codewords of dim/m doubles.
    */
  def trainPqCodebooks(df: DataFrame, id: String, vec: String, dim: Int,
                       m: Int, k: Int, trainFraction: Double,
                       seed: Long): Array[Array[Array[Double]]] = {
    require(dim > 0 && m > 0 && dim % m == 0,
      s"m ($m) must divide dim ($dim) into equal subvectors")
    require(k >= 2, "need at least 2 codewords")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sub = dim / m
    val rows = pqRows(df, id, vec, dim)
    val minTrain = k * 4L
    // persist BEFORE the existence check so the limit-count starts
    // populating the cache instead of costing a whole extra sample scan
    val sample =
      if (trainFraction >= 1.0) rows
      else Sampling.hashSample(rows, "id", trainFraction)
    sample.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val trainSet =
      if ((sample eq rows) ||
          sample.limit(minTrain.toInt).count() >= minTrain) sample
      else {
        sample.unpersist(blocking = false)
        rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        rows
      }
    try {
      // materialize the shared cache ONCE before the concurrent fits —
      // otherwise m first-passes race to compute the same partitions
      val n = trainSet.count()
      // fail loudly on a degenerate corpus: KMeans(k) over fewer than
      // k points would "train" duplicate/short codebooks silently and
      // every downstream encode would be plausible-but-meaningless
      require(n >= k,
        s"PQ training needs >= $k vectors per codebook, corpus has $n")
      // a sampled trainer drowns in per-task scheduling (m books ×
      // iters × init passes, each a job over 32 near-empty scan-floor
      // partitions): size the fit input at ~8k rows/task off the count
      // we already paid for — cross-fit concurrency supplies the
      // parallelism that single-digit-partition jobs give up
      val fitInput = trainSet.coalesce(
        math.max(1L, math.min(n / 8192L + 1, 32L)).toInt)
      // the m fits are INDEPENDENT (separate estimator per subspace,
      // seed + j each) — run them concurrently instead of driver-
      // sequenced: job submission is thread-safe, results are
      // order-independent, and the wall-clock drops from m trainings
      // to ~m/pool (measured 12.6 → 4.5 s on the m=16 q115 trainer).
      // maxIter 3: PQ codebooks only need to carve each SUBSPACE
      // coarsely (reconstruction is summed over m books, averaging
      // out per-book slack); measured on the embeddings fixture,
      // iter 3 → 5 moves mean cos_q < 0.01 per extra training pass
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.min(m, 8))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val fits = (0 until m).map { j =>
          scala.concurrent.Future {
            val slices = fitInput.select(
              array_to_vector(slice(col("v"), j * sub + 1, sub))
                .as("features"))
            new KMeans().setK(k).setSeed(seed + j).setMaxIter(3)
              .setFeaturesCol("features").fit(slices)
              .clusterCenters.map(_.toArray)
          }
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(fits),
          scala.concurrent.duration.Duration.Inf).toArray
      } finally pool.shutdown()
    } finally trainSet.unpersist(blocking = false) // even on a failed fit
  }

  /** The quantizable-row projection shared by training, encode, and
    * search — ONE definition so they always agree on corpus membership.
    * NULL elements are excluded with the malformed rows: Spark's
    * `aggregate()` fold propagates NULL where DuckDB's `list_aggregate`
    * SKIPS it, so a partially-null vector would quantize to different
    * sums in the two engines (and train/score as garbage regardless).
    */
  private def pqRows(df: DataFrame, id: String, vec: String,
                     dim: Int): DataFrame =
    df.filter(col(vec).isNotNull && size(col(vec)) === dim &&
        !exists(col(vec), x => x.isNull))
      .select(col(id).as("id"), col(vec).cast("array<double>").as("v"))

  // Encode / reconstruct / ADC are native codegen expressions
  // (graft.functions.Pq): the composed-Column forms inlined every
  // codebook double as a codegen literal — m·k·dim ≈ 1k literals per
  // plan, the CLAUDE.md JIT anti-pattern — where the expressions pass
  // the books via addReferenceObj with bit-identical float semantics.

  def pqQuantize(df: DataFrame, id: String, vec: String, dim: Int,
                 m: Int = 8, k: Int = 16,
                 trainFraction: Double = 0.25,
                 seed: Long = 42L): DataFrame =
    pqQuantizeWith(df, id, vec, dim,
      trainPqCodebooks(df, id, vec, dim, m, k, trainFraction, seed))

  /** [[pqQuantize]] against caller-supplied codebooks — the split that
    * lets one seeded training pass serve encode, search, AND an
    * external replay (the codebooks are plain literals, so a SQL
    * oracle can re-run argmin-encode + both audits bit-exactly).
    * Metrics snapped with the repr-robust floor form, not `round`
    * ([[graft.functions.Rounding]]).
    */
  def pqQuantizeWith(df: DataFrame, id: String, vec: String, dim: Int,
                     codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    require(m > 0 && dim % m == 0, s"m ($m) must divide dim ($dim)")
    val rows = pqRows(df, id, vec, dim)
    rows.withColumn("codes", graft.functions.Pq.encode(col("v"), codebooks))
      .withColumn("dq",
        graft.functions.Pq.reconstruct(col("codes"), codebooks))
      .select(col("id").as(id), col("codes"),
        graft.functions.Rounding.reprRound6(aggregate(
            zip_with(col("v"), col("dq"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, x) => a + x) / lit(dim.toDouble)).as("mse"),
        // NULL, not 0/0: an all-zero vector or reconstruction gives
        // NaN, which diverges from the oracle and out-ranks everything
        // in downstream windows (CLAUDE.md NaN rule)
        graft.functions.Rounding.reprRound6(
          when(graft.functions.Vectors.norm(col("v")) *
              graft.functions.Vectors.norm(col("dq")) > 0,
            dot(col("v"), col("dq")) /
              (graft.functions.Vectors.norm(col("v")) *
               graft.functions.Vectors.norm(col("dq"))))).as("cos_q"))
  }

  /** PQ-ADC approximate top-k: the corpus is ranked by the cosine of
    * each query with the CODEBOOK RECONSTRUCTION of every corpus vector
    * — computed from the m small codes alone (asymmetric distance
    * computation). This is the scan shape that matters at 10⁹ vectors:
    * after a one-time encode, the search reads m·log₂k BITS per corpus
    * row (4 bytes at the defaults) instead of the 32·dim-bit vector,
    * and the scoring expression touches only codes + broadcast
    * codebook/query literals — no shuffle of anything corpus-sized
    * (the candidate-free full-scan analog of [[ivfCosineTopK]]; compose
    * with IVF cells to prune the scan when recall permits).
    *
    * The reconstruction norm is precomputed ONCE per corpus row at
    * encode time, so per-(row, query) work is m code lookups + dim
    * multiplies. Exact-rank verification of the returned candidates
    * (re-scoring top-k' with true vectors) is the standard refinement;
    * here the spec measures recall vs [[bruteForceTopK]] directly.
    */
  def pqCosineTopK(corpus: DataFrame, queries: DataFrame,
                   id: String, vec: String, k: Int,
                   dim: Int, m: Int = 8, kCodes: Int = 16,
                   trainFraction: Double = 0.25,
                   seed: Long = 42L): DataFrame =
    pqCosineTopKWith(corpus, queries, id, vec, k, dim,
      trainPqCodebooks(corpus, id, vec, dim, m, kCodes, trainFraction, seed))

  /** [[pqCosineTopK]] against caller-supplied codebooks (see
    * [[pqQuantizeWith]] for why the split exists). */
  def pqCosineTopKWith(corpus: DataFrame, queries: DataFrame,
                       id: String, vec: String, k: Int, dim: Int,
                       codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    require(m > 0 && dim % m == 0, s"m ($m) must divide dim ($dim)")
    val rows = pqRows(corpus, id, vec, dim)
    val encoded = rows
      .withColumn("codes", graft.functions.Pq.encode(col("v"), codebooks))
      .select(col("id"), col("codes"),
        graft.functions.Vectors.norm(
          graft.functions.Pq.reconstruct(col("codes"), codebooks))
          .as("dqnorm"))
      .localCheckpoint(eager = false) // encode once, not once per query
    // query validity mirrors the corpus's pqRows rule (and the q112
    // oracle's qn CTE): a malformed query must drop, not crash the
    // ADC scan inside PqAdcExpr
    val q = prep(queries, id, vec, "qid", "qv", "qnorm")
      .filter(size(col("qv")) === dim && !exists(col("qv"), x => x.isNull))
    // ADC score: sum over subspaces of dot(codeword[code_j], q_sub_j)
    // == dot(reconstruction, query), from codes alone
    val adc = graft.functions.Pq.adc(col("codes"), col("qv"), codebooks)
    val sims = encoded.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      // NULL, not 0/0: a zero-norm reconstruction or query would give
      // NaN, which Spark orders ABOVE every real cosine — the junk row
      // would take rank 1. desc puts nulls last instead.
      .withColumn("cosine_adc",
        when(col("dqnorm") * col("qnorm") > 0,
          adc / (col("dqnorm") * col("qnorm"))))
      .select("qid", "id", "cosine_adc")
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine_adc").desc, col("id").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cosine_adc", "rank")
  }

  /** PQ-ADC search with exact re-rank — the standard two-stage ANN
    * refinement [[pqCosineTopK]]'s doc names: stage 1 ranks the WHOLE
    * corpus from 4-byte codes alone and keeps `k · refine` candidates
    * per query; stage 2 re-scores only those candidates with their TRUE
    * vectors and returns the exact-cosine top-k. Recall is set by how
    * often the true top-k survives into the ADC top-(k·refine) — far
    * weaker than ADC order being exactly right — so `refine` buys back
    * quantization loss at a cost of k·refine exact scores per query.
    * Measured on the near-random embeddings fixture (the worst case —
    * top-10 cosines sit in a 0.3–0.5 band, so code error swamps true
    * gaps): ADC-only recall@10 is 0.14/0.34/0.40 at m = 4/8/16, and
    * refined recall at m=16 is 0.76/0.92/1.00 at refine = 4/8/16.
    * Clustered real-corpus embeddings do far better at every setting;
    * size `m`/`refine` DOWN from the fixture numbers, not up.
    *
    * Scale shape: stage 1 is the codes-only scan; the candidate set
    * (queries × k·refine ids) BROADCASTS back onto the corpus scan, so
    * the true vectors are read map-side for candidates only — the full
    * vectors never shuffle and are touched exactly once.
    */
  def pqCosineTopKRefined(corpus: DataFrame, queries: DataFrame,
                          id: String, vec: String, k: Int,
                          dim: Int, m: Int = 8, kCodes: Int = 16,
                          trainFraction: Double = 0.25,
                          seed: Long = 42L, refine: Int = 8): DataFrame =
    pqCosineTopKRefinedWith(corpus, queries, id, vec, k, dim,
      trainPqCodebooks(corpus, id, vec, dim, m, kCodes, trainFraction, seed),
      refine)

  /** [[pqCosineTopKRefined]] against caller-supplied codebooks (see
    * [[pqQuantizeWith]] for why the split exists). */
  def pqCosineTopKRefinedWith(corpus: DataFrame, queries: DataFrame,
                              id: String, vec: String, k: Int, dim: Int,
                              codebooks: Array[Array[Array[Double]]],
                              refine: Int): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val cand = pqCosineTopKWith(corpus, queries, id, vec, k * refine,
        dim, codebooks)
      .select("qid", "id")
    exactRerank(corpus, queries, id, vec, k, dim, cand)
  }

  /** Stage 2 of every refined ANN: exact cosine over the (qid, id)
    * candidate set only — candidate ids and queries broadcast, true
    * vectors read map-side exactly once, never shuffled. */
  private def exactRerank(corpus: DataFrame, queries: DataFrame,
                          id: String, vec: String, k: Int, dim: Int,
                          cand: DataFrame): DataFrame = {
    val c = prep(pqRows(corpus, id, vec, dim), "id", "v", "id", "v", "norm")
    val q = prep(queries, id, vec, "qid", "qv", "qnorm")
    val sims = c.join(broadcast(cand), Seq("id"))
      .join(broadcast(q), Seq("qid"))
      // NULL, not 0/0 — the pqCosineTopK NaN-rank rule
      .withColumn("cosine",
        when(col("norm") * col("qnorm") > 0,
          dot(col("v"), col("qv")) / (col("norm") * col("qnorm"))))
      .select("qid", "id", "cosine")
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("id").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }

  /** IVF-PQ ANN (the FAISS "IVFADC" composition — the shape a 10⁹-
    * vector index actually runs): ONE corpus scan builds the index
    * projection (cell, m codes, reconstruction norm); a query then
    * touches only its `nProbe` cells' members, scores them from CODES
    * alone (ADC), and exact-reranks the ADC top-(k·refine) with true
    * vectors. Cost per query = (probed fraction of corpus) code
    * lookups + k·refine true-vector reads — both knobs independent:
    * `nProbe` buys candidate RECALL (which cells are seen at all),
    * `refine` buys ranking precision within them.
    *
    * Scale shape: the index projection is codes-only (≈ cell +
    * m·log₂kCodes bits + 8B norm per row) and never reshuffles; query
    * cells and candidate ids broadcast; the full vectors are read
    * map-side once at encode and once for the candidate rerank.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                id: String, vec: String, k: Int, dim: Int,
                nCells: Int = 16, nProbe: Int = 8,
                m: Int = 8, kCodes: Int = 16,
                trainFraction: Double = 0.25,
                seed: Long = 42L, refine: Int = 8): DataFrame = {
    val centroids =
      trainIvfCentroids(corpus, id, vec, nCells, trainFraction, seed, dim)
    ivfPqTopKWith(corpus, queries, id, vec, k, dim, nProbe, centroids,
      trainPqCodebooks(ivfResiduals(corpus, id, vec, dim, centroids),
        "id", "rv", dim, m, kCodes, trainFraction, seed),
      refine)
  }

  /** The captured centroids as a broadcastable (cell, cv) frame. */
  private def centroidsFrame(df: DataFrame,
                             centroids: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (cv, c) => (c, cv) }
      .toSeq.toDF("cell", "cv")
  }

  /** Per-row IVF residuals: (id, cell, cv, v, rv = v − centroid(cell)).
    * THE IVFADC refinement — PQ codebooks trained/applied on residuals
    * see a domain already centered by the coarse quantizer, spending
    * their m·log₂k bits on the remainder instead of re-describing cell
    * position (the m-halving FAISS documents). Assignment is the
    * codegen argmin; the tiny centroid table broadcasts back for the
    * elementwise subtract — the corpus never shuffles. */
  def ivfResiduals(corpus: DataFrame, id: String, vec: String, dim: Int,
                   centroids: Array[Array[Double]]): DataFrame =
    pqRows(corpus, id, vec, dim)
      .withColumn("cell",
        element_at(graft.functions.Pq.ivfCells(col("v"), centroids, 1), 1))
      .join(broadcast(centroidsFrame(corpus, centroids)), Seq("cell"))
      .select(col("id"), col("cell"), col("cv"), col("v"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("rv"))

  /** [[ivfPqTopK]] against caller-supplied centroids + codebooks (see
    * [[pqQuantizeWith]] for why the split exists). `codebooks` must be
    * residual-trained ([[ivfResiduals]]) — raw-vector books would score
    * against the wrong domain. */
  def ivfPqTopKWith(corpus: DataFrame, queries: DataFrame,
                    id: String, vec: String, k: Int, dim: Int,
                    nProbe: Int, centroids: Array[Array[Double]],
                    codebooks: Array[Array[Array[Double]]],
                    refine: Int): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    // index: PQ codes of the RESIDUAL; reconstruction (for the norm the
    // ADC cosine needs) is centroid + decoded residual
    val index = ivfResiduals(corpus, id, vec, dim, centroids)
      .withColumn("codes", graft.functions.Pq.encode(col("rv"), codebooks))
      .select(col("id"), col("cell"), col("codes"),
        graft.functions.Vectors.norm(
          zip_with(col("cv"),
            graft.functions.Pq.reconstruct(col("codes"), codebooks),
            (a, b) => a + b))
          .as("dqnorm"))
      .localCheckpoint(eager = false) // the index: built once, probed per query
    // query validity mirrors the corpus's pqRows rule (and the q116
    // oracle): a malformed query must drop, not crash the probe scan.
    // Per probed cell the query carries cdot = centroid·query, so the
    // ADC numerator decomposes exactly: recon·q = centroid·q + resid·q
    // (the ADC fold) — one extra broadcast column, no extra corpus work.
    val q = prep(queries, id, vec, "qid", "qv", "qnorm")
      .filter(size(col("qv")) === dim && !exists(col("qv"), x => x.isNull))
      .select(col("qid"), col("qv"), col("qnorm"),
        explode(graft.functions.Pq.ivfCells(col("qv"), centroids, nProbe))
          .as("cell"))
      .join(broadcast(centroidsFrame(queries, centroids)), Seq("cell"))
      .withColumn("cdot", dot(col("cv"), col("qv")))
      .drop("cv")
    val adcTop = index.join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      // NULL, not 0/0 — the pqCosineTopK NaN-rank rule
      .withColumn("cosine_adc",
        when(col("dqnorm") * col("qnorm") > 0,
          (col("cdot") +
            graft.functions.Pq.adc(col("codes"), col("qv"), codebooks)) /
            (col("dqnorm") * col("qnorm"))))
      .withColumn("rank", row_number().over(Window.partitionBy("qid")
        .orderBy(col("cosine_adc").desc, col("id").asc)))
      .filter(col("rank") <= k * refine)
      .select("qid", "id")
    exactRerank(corpus, queries, id, vec, k, dim, adcTop)
  }

  // --------------------------------------------------------------------
  // Scalar quantization (int8-style compression audit)
  // --------------------------------------------------------------------

  /** Per-vector scalar-quantization audit: each embedding is encoded to
    * `levels`+1 integer codes on a per-DIMENSION min/max grid (the
    * standard int8 compression an ANN index applies before storing 10⁹
    * vectors — 4× memory vs float32, which at 100 TB of embeddings is
    * the difference between in-RAM and not), then decoded, and the
    * output reports what the compression did to each vector:
    * `code_sum` (an order-free checksum of the codes themselves),
    * `mse` (mean squared reconstruction error), and `cos_q` (cosine of
    * the vector with its own reconstruction — the metric that predicts
    * ANN recall loss).
    *
    * Scale shape: the dim-sized min/max table is ONE aggregation
    * (posexplode → per-pos min/max → one row of bounds arrays) and
    * BROADCASTS back onto the scan; encode/decode/error are a map-side
    * projection — the corpus never shuffles. Per-dimension bounds, not
    * global: one wild dimension would otherwise crush the resolution of
    * every other.
    *
    * Determinism: min/max are exact; encode/decode use only +,−,×,/ and
    * round — IEEE correctly-rounded, so an external SQL oracle replays
    * every code and both metrics exactly (final metrics rounded at 6 dp
    * to absorb sum-order ulps, the q97 convention). A constant
    * dimension (mx == mn) encodes to 0 and decodes to mn exactly.
    */
  def quantizeInt8(df: DataFrame, id: String, vec: String, dim: Int,
                   levels: Int = 255): DataFrame = {
    require(dim > 0, "dim must be positive")
    require(levels >= 1, "levels must be >= 1")
    val rows = pqRows(df, id, vec, dim)
    val bounds = rows
      .select(posexplode(col("v")))
      .groupBy("pos").agg(min("col").as("mn"), max("col").as("mx"))
      .groupBy()
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          s => s.getField("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
          s => s.getField("mx")).as("mxs"))
    val L = lit(levels.toDouble)
    def mn(i: Column) = element_at(col("mns"), i + 1)
    def mx(i: Column) = element_at(col("mxs"), i + 1)
    def x(i: Column) = element_at(col("v"), i + 1)
    val idx = sequence(lit(0), lit(dim - 1))
    val codes = transform(idx, i =>
      when(mx(i) > mn(i), round((x(i) - mn(i)) / (mx(i) - mn(i)) * L))
        .otherwise(lit(0.0)))
    val deq = (cs: Column) => transform(idx, i =>
      mn(i) + element_at(cs, i + 1) * (mx(i) - mn(i)) / L)
    rows.crossJoin(broadcast(bounds))
      .withColumn("codes", codes)
      .withColumn("dq", deq(col("codes")))
      .select(col("id").as(id),
        aggregate(col("codes"), lit(0L), (a, c) => a + c.cast("long"))
          .as("code_sum"),
        round(aggregate(
            sequence(lit(0), lit(dim - 1)), lit(0.0),
            (a, i) => a + (x(i) - element_at(col("dq"), i + 1)) *
              (x(i) - element_at(col("dq"), i + 1))) / lit(dim.toDouble), 6)
          .as("mse"),
        // same NULL-on-zero-norm guard as pqQuantize (CLAUDE.md NaN rule)
        round(when(graft.functions.Vectors.norm(col("v")) *
            graft.functions.Vectors.norm(col("dq")) > 0,
          dot(col("v"), col("dq")) /
            (graft.functions.Vectors.norm(col("v")) *
             graft.functions.Vectors.norm(col("dq")))), 6)
          .as("cos_q"))
  }
}
