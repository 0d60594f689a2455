package graft.ext

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "spark makes distributed data processing simple fast and reliable for very large analytical workloads at scale"
  private val nearDup = base.replace("reliable", "robust") // 1 of 16 words changed
  private val unrelated =
    "completely different subject matter about cooking pasta with tomatoes garlic basil and olive oil tonight"

  private lazy val docs = Seq(
    (1L, base), (2L, base), (3L, nearDup), (4L, unrelated)
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per identical text") {
    val ids = Dedup.exactSurvivors(docs, "doc_id", "text")
      .as[Long].collect().sorted
    assert(ids === Array(1L, 3L, 4L))
    assert(Dedup.exactDedup(docs, "doc_id", "text").count() === 3)
  }

  test("jaccard pairs find exact and near duplicates, not unrelated") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5,
        maxDocFrequency = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) === 1.0)
    // 15 shared of 17 union tokens
    assert(math.abs(pairs((1L, 3L)) - 15.0 / 17.0) < 1e-12)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("containment finds the snippet engulfed by a larger page that " +
      "jaccard misses") {
    val snippet = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, snippet),                  // the quoted source
      (2L, s"$snippet $filler"),      // aggregator: snippet + 40 words
      (3L, "totally unrelated words here none shared at all")
    ).toDF("doc_id", "text")
    val c = Dedup.containmentPairs(d, "doc_id", "text", tau = 0.9,
        ngram = 3, maxDocFrequency = None, maxTokenDocs = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every 3-gram of the snippet appears contiguously inside doc 2
    assert(c((1L, 2L)) === 1.0)
    // the reverse direction is far below tau: 2's shingles mostly novel
    assert(!c.contains((2L, 1L)))
    assert(!c.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // and jaccard at the same tau sees nothing: |A|/|B| ≈ 6/46
    assert(Dedup.jaccardPairs(d, "doc_id", "text", 0.5, ngram = 3,
      maxDocFrequency = None, maxTokenDocs = None).count() === 0)
  }

  test("containment: exact duplicates contain each other (both directions)") {
    val d = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six")
    ).toDF("doc_id", "text")
    val c = Dedup.containmentPairs(d, "doc_id", "text", tau = 0.99, ngram = 3,
        maxDocFrequency = None, maxTokenDocs = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c === Map((1L, 2L) -> 1.0, (2L, 1L) -> 1.0))
  }

  test("containment guards prune hot shingles from numerator AND " +
      "denominator together") {
    // the shared boilerplate sentence is in every doc (df = 3 > 0.7*3);
    // after pruning, docs 1 and 2 are identical -> containment 1.0 both
    // ways, and doc 3 shares nothing that survives
    val boiler = "subscribe to our newsletter today"
    val d = Seq(
      (1L, s"$boiler unique alpha beta gamma delta"),
      (2L, s"$boiler unique alpha beta gamma delta"),
      (3L, s"$boiler other content entirely different")
    ).toDF("doc_id", "text")
    val c = Dedup.containmentPairs(d, "doc_id", "text", tau = 0.9, ngram = 3,
        maxDocFrequency = Some(0.7), maxTokenDocs = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c.keySet === Set((1L, 2L), (2L, 1L)))
    assert(c((1L, 2L)) === 1.0)
  }

  test("containmentPairsPrefix ≡ containmentPairs (row-identical, " +
      "guards on and off)") {
    // overlapping word soup: every doc shares a sliding window with its
    // neighbors, plus planted exact dups and an engulfed snippet
    val words = (0 until 60).map(i => s"w${i % 23}")
    val d = ((0 until 30).map { i =>
      (i.toLong, words.slice(i % 18, i % 18 + 12 + i % 5).mkString(" "))
    } ++ Seq((100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "alpha beta gamma delta epsilon zeta plus extra tail words here"),
      (102L, "alpha beta gamma delta epsilon zeta")))
      .toDF("doc_id", "text")
    for (guards <- Seq(true, false)) {
      val mdf = if (guards) Some(0.5) else None
      val mtd = if (guards) Some(1000L) else None
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))
      val naive = Dedup.containmentPairs(d, "doc_id", "text", tau = 0.7,
        ngram = 3, maxDocFrequency = mdf, maxTokenDocs = mtd)
        .collect().map(key).toSet
      val prefix = Dedup.containmentPairsPrefix(d, "doc_id", "text", tau = 0.7,
        ngram = 3, maxDocFrequency = mdf, maxTokenDocs = mtd)
        .collect().map(key).toSet
      assert(prefix === naive, s"guards=$guards")
      assert(naive.nonEmpty)
    }
  }

  test("doc-frequency pruning keeps identical docs at jaccard 1.0") {
    // 'the'/'and' appear in every doc and get pruned; identical docs must
    // still compare at 1.0 (pruned similarity = similarity of pruned sets)
    val d = Seq(
      (1L, "the quick fox and lazy dog"),
      (2L, "the quick fox and lazy dog"),
      (3L, "the slow cat and happy bird")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(d, "doc_id", "text", 0.9,
        maxDocFrequency = Some(0.7))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(!pairs.contains((1L, 3L)))
  }

  test("prefix-filtered jaccard equals the full token join") {
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5,
        maxDocFrequency = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9)).toMap
    val pref = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 0.5, ngram = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9)).toMap
    assert(full === pref)
  }

  test("prefix-filtered jaccard equals full join on the real corpus (3-gram)") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val full = Dedup.jaccardPairs(real, "doc_id", "text", 0.5, ngram = 3,
        maxDocFrequency = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pref = Dedup.jaccardPairsPrefix(real, "doc_id", "text", 0.5, ngram = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === pref)
    assert(full.nonEmpty) // the corpus plants near-dups; empty would be vacuous
  }

  test("contaminationStats counts benchmark n-gram overlap; decontaminate filters") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro words then the quick brown fox jumps over the lazy dog indeed"),
      (2L, "completely unrelated text about sparks and engines here"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val stats = Dedup.contaminationStats(corpus, bench, "doc_id", "text",
        ngram = 5, minOverlap = 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // doc 1 contains the benchmark's full 9-word run -> 5 distinct 5-grams
    assert(stats(1L) === ((5L, true)))
    assert(stats(2L) === ((0L, false)))
    assert(stats(3L) === ((0L, false))) // null text: clean, still a row
    val kept = Dedup.decontaminate(corpus, bench, "doc_id", "text", 5, 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
  }

  test("semanticContaminationStats flags planted near-copies, keeps malformed rows") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),          // source of bench vector 10
      (2L, Seq(0.0f, 1.0f, 0.0f)),          // orthogonal to both bench rows
      (3L, Seq(0.9f, 0.1f, 0.0f)),          // close to bench 10
      (4L, Seq(0.0f, 0.0f, 0.0f)),          // zero norm: unscorable
      (5L, null.asInstanceOf[Seq[Float]]),  // null vector: unscorable
      (6L, Seq(1.0f, 2.0f))                 // wrong dimension: unscorable
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticContaminationStats(corpus, "vec_id", "embedding",
        benchIds = Array(10L, 20L),
        benchVecs = Array(Array(1.0, 0.05, 0.0), Array(0.0, 0.0, 1.0)),
        tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L)._3 === Some(1))
    assert(out(1L)._2 === Some(10L))
    assert(out(2L)._3 === Some(0)) // cos to bench10 = .05/norm, to bench20 = 0
    assert(out(3L)._3 === Some(1))
    assert(out(3L)._2 === Some(10L))
    // unscorable rows are KEPT with null audit columns, never dropped
    Seq(4L, 5L, 6L).foreach { id =>
      assert(out(id) === ((None, None, None)), s"row $id")
    }
    assert(out.size === 6)
  }

  test("semanticContaminationStats argmax ties break to the lowest bench id") {
    val corpus = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Dedup.semanticContaminationStats(corpus, "vec_id", "embedding",
        benchIds = Array(7L, 3L), // ids out of order on purpose: the
        benchVecs = Array(Array(2.0, 0.0), Array(2.0, 0.0)),
        tau = 0.5) // caller supplies rows AS ORDERED; equal cosines
      .collect()   // resolve to the first matrix row
    assert(out.head.getLong(2) === 7L)
  }

  test("collectBenchmarkVectors: gate throws, ordering by id, clean-row contract") {
    val big = spark.range(0, 50).selectExpr("id AS vec_id",
      "array(CAST(id AS FLOAT), 1.0F) AS embedding")
    val e = intercept[IllegalArgumentException] {
      Dedup.collectBenchmarkVectors(big, "vec_id", "embedding", maxRows = 10)
    }
    assert(e.getMessage.contains("exceeds"))
    val (ids, vecs) = Dedup.collectBenchmarkVectors(
      big.orderBy(org.apache.spark.sql.functions.rand(7)), "vec_id",
      "embedding", maxRows = 100)
    assert(ids.toSeq === (0L until 50L))
    assert(vecs(3).toSeq === Seq(3.0, 1.0))
    val zero = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Dedup.semanticContaminationStats(zero, "vec_id", "embedding",
        Array(1L), Array(Array(0.0, 0.0)), 0.9) // zero-norm benchmark
    }
  }

  test("incremental minhash equals the full join restricted to batch-touching pairs") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val full = Dedup.minhashPairs(real, "doc_id", "text", tau = 0.5,
        ngram = 3, numHashes = 64, bands = 16, maxBucketSize = Some(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9))
      .toMap
    val catalog = Dedup.minhashSignatures(real.filter($"doc_id" < 250), "doc_id", "text", 3, 64)
    val batch = Dedup.minhashSignatures(real.filter($"doc_id" >= 250), "doc_id", "text", 3, 64)
    val inc = Dedup.incrementalMinhashPairs(batch, catalog, tau = 0.5,
        bands = 16, maxBucketSize = Some(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9))
      .toMap
    // id_b is the larger member, so touching-the-batch == id_b >= 250
    assert(inc === full.filter { case ((_, b), _) => b >= 250 })
    assert(inc.nonEmpty) // planted dups must cross the boundary
  }

  test("incremental minhash: a re-ingested id uses the batch signature") {
    // catalog holds doc 1's OLD text; the batch re-ingests doc 1 with
    // text identical to new doc 2 — the (1, 2) pair must surface at
    // est 1.0, which only happens if the batch signature wins
    val catalog = Dedup.minhashSignatures(
      Seq((1L, "totally different old content nothing alike at all"))
        .toDF("doc_id", "text"), "doc_id", "text", 3, 64)
    val batch = Dedup.minhashSignatures(
      Seq((1L, "the new shared text body for both documents"),
          (2L, "the new shared text body for both documents"))
        .toDF("doc_id", "text"), "doc_id", "text", 3, 64)
    val pairs = Dedup.incrementalMinhashPairs(batch, catalog,
        tau = 0.9, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs === Map((1L, 2L) -> 1.0))
  }

  test("incremental minhash tolerates null catalog signatures") {
    val batch = Dedup.minhashSignatures(
      Seq((10L, "some fresh batch text body here")).toDF("doc_id", "text"),
      "doc_id", "text", 3, 64)
    val catalog = Dedup.minhashSignatures(
        Seq((1L, "old unrelated catalog text entirely")).toDF("doc_id", "text"),
        "doc_id", "text", 3, 64)
      .unionByName(Seq((2L, null.asInstanceOf[Seq[Long]])).toDF("id", "sig"))
    // the null-sig row bands nowhere; the job must not die on it
    assert(Dedup.incrementalMinhashPairs(batch, catalog, tau = 0.5, bands = 16)
      .count() === 0L)
  }

  test("contamination handles null ids and blank docs correctly") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "   ") // blank benchmark doc must not poison blank corpus docs
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (Some(1L), "clean text entirely unrelated to anything benchmarked here"),
      (None, "the quick brown fox jumps over the lazy dog"), // null id, dirty
      (Some(3L), "") // blank corpus doc: clean
    ).toDF("doc_id", "text")
    val stats = Dedup.contaminationStats(corpus, bench, "doc_id", "text", 5, 1L)
      .collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) ->
        (r.getLong(1), r.getBoolean(2))).toMap
    assert(stats(Some(1L)) === ((0L, false)))
    assert(stats(None)._2 === true) // null-id leakage must be REPORTED
    assert(stats(Some(3L)) === ((0L, false)))
    val kept = Dedup.decontaminate(corpus, bench, "doc_id", "text", 5, 1L)
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long])).toSet
    assert(kept === Set(Some(1L), Some(3L))) // clean null-id WOULD be kept; dirty one dropped
  }

  test("default skew guard (df<=0.5) is a no-op on the sparse real corpus") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val guarded = Dedup.jaccardPairs(real, "doc_id", "text", 0.5, ngram = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9)).toMap
    val exact = Dedup.jaccardPairs(real, "doc_id", "text", 0.5, ngram = 3,
        maxDocFrequency = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9)).toMap
    assert(guarded === exact) // no 3-gram shingle spans half this corpus
  }

  test("absolute token cap bounds the pair stream at the df=0.5 boundary") {
    // A token in EXACTLY half the corpus passes the fractional guard
    // (df <= 0.5·n) yet pairs every carrier with every other — the
    // quadratic boundary the absolute cap exists for. 30 docs, token
    // "boundary" planted in 15 of them (df = 0.5·n exactly), plus one
    // genuine rare-token near-dup pair.
    import spark.implicits._
    val docs = (
      (1L to 15L).map(i => (i, s"boundary only${i}a only${i}b only${i}c")) ++
      Seq((16L, "rare gem alpha beta"), (17L, "rare gem alpha beta")) ++
      (18L to 30L).map(i => (i, s"fill${i}a fill${i}b fill${i}c fill${i}d"))
    ).toDF("doc_id", "text")
    // fractional guard ALONE keeps the boundary token -> 15*14/2 = 105
    // candidate pairs from one token (none reach tau, but the join paid
    // for them); the absolute cap drops it before the self-join
    val fracOnly = Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.01,
        maxDocFrequency = Some(0.5), maxTokenDocs = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fracOnly.count { case (a, b) => a <= 15L && b <= 15L } === 105)
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.01,
        maxDocFrequency = Some(0.5), maxTokenDocs = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // boundary-token pairs gone; the rare-token near-dup survives with
    // pruned-set-exact similarity (identical docs -> 1.0)
    assert(!capped.keySet.exists { case (a, b) => a <= 15L && b <= 15L })
    assert(capped.keySet === Set((16L, 17L)))
    assert(math.abs(capped((16L, 17L)) - 1.0) < 1e-12)
  }

  test("ngram shingles: doc shorter than n becomes one whole-text shingle") {
    val short = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    val sh = Dedup.shinglesDF(short, "doc_id", "text", 3).collect()
    assert(sh.length === 1 && sh.head.getString(1) === "tiny doc")
  }

  test("minhash LSH detects planted near-dups and skips unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        tau = 0.5, ngram = 3, numHashes = 128, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical: est jaccard = 1
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash estimate approximates exact jaccard on identical docs") {
    val est = Dedup.minhashPairs(docs, "doc_id", "text", tau = 0.0,
        ngram = 1, numHashes = 128, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est((1L, 2L)) === 1.0)
  }

  test("simhash: identical docs at hamming 0; unrelated docs absent") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("incremental dedup: in-batch dup collapses, seen digests excluded") {
    val seen = Dedup.digestCatalog(
      Seq((1L, "already ingested")).toDF("doc_id", "text"), "text")
    val batch = Seq(
      (10L, "brand new"),
      (11L, "brand new"),          // in-batch dup of 10
      (12L, "already ingested"),   // dup of the catalog
      (13L, "also new")
    ).toDF("doc_id", "text")
    val surv = Dedup.incrementalSurvivors(batch, seen, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(surv === Set(10L, 13L))
  }

  test("incremental dedup over all batches == one-shot exact dedup") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val b1 = docs.filter($"doc_id" < 150)
    val b2 = docs.filter($"doc_id" >= 150)
    val fromB1 = Dedup.exactSurvivors(b1, "doc_id", "text")
    val fromB2 = Dedup.incrementalSurvivors(
      b2, Dedup.digestCatalog(b1, "text"), "doc_id", "text")
    val incremental = fromB1.union(fromB2).collect().map(_.getLong(0)).toSet
    val oneShot = Dedup.exactSurvivors(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(incremental === oneShot)
  }

  test("connectedComponents: chains merge transitively, clusters stay apart") {
    // 1-2-3-4 is a chain (1~4 never paired directly), 10-11 separate,
    // 20-21-22 a triangle with redundant edges
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val c = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(c) === Seq(1L, 1L, 1L, 1L))
    assert(c(10L) === 10L && c(11L) === 10L)
    assert(Seq(20L, 21L, 22L).map(c).toSet === Set(20L))
    assert(c.size === 9)
  }

  test("connectedComponents: long path converges within iteration budget") {
    val chain = (0L until 30L).sliding(2).map(s => (s(0), s(1))).toSeq
    val c = Dedup.connectedComponents(chain.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c.values.toSet === Set(0L), "whole chain must collapse to min id")
  }

  test("connectedComponents: distributed loop on a long path " +
      "(maxDriverEdges = 0 forces it past the union-find fast path)") {
    val chain = (0L until 30L).sliding(2).map(s => (s(0), s(1))).toSeq
    val c = Dedup.connectedComponents(chain.toDF("id_a", "id_b"),
        maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c.values.toSet === Set(0L), "whole chain must collapse to min id")
    assert(c.size === 30)
  }

  test("connectedComponents: driver union-find ≡ distributed loop on a " +
      "random graph (both are the min-reachable-id labeling)") {
    val rnd = new scala.util.Random(7)
    // ids drawn sparse so chains, triangles, and isolated pairs all occur
    val pairs = Seq.fill(400)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
      .localCheckpoint() // one deterministic pair set for both paths
    val fast = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === dist)
  }

  test("cosinePairsBlocked: subset of exact pairs, same cosines, real recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Dedup.cosinePairs(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val blocked = Dedup.cosinePairsBlocked(emb, "vec_id", "embedding", 0.3,
        tables = 16, nPlanes = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(blocked.nonEmpty, "LSH blocking must surface some pairs")
    blocked.foreach { case (k, c) =>
      assert(exact.contains(k), s"blocked pair $k not in exact set")
      assert(math.abs(exact(k) - c) < 1e-12, s"cosine differs for $k")
    }
    // data-oblivious sign-LSH at a low tau=0.3 is a weak filter by
    // design; the bound documents measured behavior so a regression in
    // the plane construction is caught
    val recall = blocked.size.toDouble / exact.size
    assert(recall >= 0.15, s"recall collapsed: $recall (${blocked.size}/${exact.size})")
  }

  test("cosinePairsBlocked at adaptivePlanes: planted near-dups still collide") {
    // a true near-dup (cosine -> 1) collides per-plane with prob -> 1,
    // so thinning buckets with MORE planes (the scale fix for fixed-b
    // occupancy growth) must not lose it — the q19/q104 recall contract
    // at sizes where adaptivePlanes exceeds the minimum 8
    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val base = Seq.tabulate(300)(i => (i.toLong, unit()))
    // plant 3 exact-direction duplicates of ids 0/1/2
    val dups = (0 until 3).map(i => (1000L + i, base(i)._2.map(x => (x * 0.5f))))
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val np = Similarity.adaptivePlanes(303, targetOccupancy = 1) // force > 8
    assert(np > 8, s"fixture must exercise the adaptive regime, got $np")
    val pairs = Dedup.cosinePairsBlocked(emb, "vec_id", "embedding", 0.99,
        tables = 16, nPlanes = np, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 3)
      assert(pairs.contains((i.toLong, 1000L + i)),
        s"planted dup $i lost at nPlanes=$np")
  }

  test("duplicatedSpanStats: cross-doc span, in-doc run, clean doc") {
    val shared = "0123456789abcdefghij" // 20 chars
    val df = Seq(
      (1L, shared + "KLMNOPQRSTUV"),      // len 32, shared at pos 1
      (2L, "zyxwv" + shared),             // len 25, shared at pos 6
      (3L, "completely different text here!"), // len 31, clean
      (4L, "PPPPPPPPPPPPPPP")             // len 15, self-repeating run
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanStats(df, "doc_id", "text", k = 10)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // 11 windows fit in the 20 shared chars; their union covers all 20
    assert(out(1L) === ((11L, 20L, 0.625)))   // 20/32
    assert(out(2L) === ((11L, 20L, 0.8)))     // 20/25
    assert(out(3L) === ((0L, 0L, 0.0)))
    // 6 identical windows in the 15-char run cover the whole doc
    assert(out(4L) === ((6L, 15L, 1.0)))
  }

  test("duplicatedSpanStats: null-id docs report NULL, never pooled stats") {
    val df = Seq(
      (Option.empty[Long], "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"), // 30-char run
      (Option.empty[Long], "short unique"),
      (Some(1L), "totally unrelated clean text")
    ).toDF("doc_id", "text")
    val rows = Dedup.duplicatedSpanStats(df, "doc_id", "text", k = 10)
      .collect()
    // both null-id rows: NULL stats (unattributable), NOT a merged
    // pseudo-doc and NOT a false "clean" zero
    val nullRows = rows.filter(_.isNullAt(0))
    assert(nullRows.length === 2)
    nullRows.foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), r.toString)
    }
    val attributed = rows.find(!_.isNullAt(0)).get
    assert(attributed.getLong(2) === 0L) // the clean doc stays clean
  }

  test("duplicatedSpanStats stride > 1 is a lower bound that still flags") {
    val shared = "the exact same forty characters repeated" // 40 chars
    val df = Seq((1L, shared + " A"), (2L, "B " + shared)).toDF("doc_id", "text")
    val exact = Dedup.duplicatedSpanStats(df, "doc_id", "text", k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val strided = Dedup.duplicatedSpanStats(df, "doc_id", "text", k = 10,
        stride = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    Seq(1L, 2L).foreach { id =>
      assert(strided(id) > 0L, "strided pass must still flag the overlap")
      assert(strided(id) <= exact(id), "strided coverage is a lower bound")
    }
  }

  test("stripDuplicatedSpans: planted cross-doc span vanishes from both " +
      "docs, unique text survives byte-identical") {
    val shared = "0123456789abcdefghij" // 20 chars
    val u1a = "UNIQUE-HEAD-ONE:"
    val u1b = ":TAIL-ONE-UNIQ"
    val u2 = "second doc own words "
    val df = Seq(
      (1L, u1a + shared + u1b),
      (2L, u2 + shared),
      (3L, "completely different text here!") // clean
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stripDuplicatedSpans(df, "doc_id", "text", k = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    // windows straddling the unique/shared boundary occur once, so the
    // removed union is EXACTLY the shared 20 chars in each doc
    assert(out(1L).getString(1) === u1a + u1b)
    assert(out(1L).getLong(2) === 1L && out(1L).getLong(3) === 20L)
    assert(out(2L).getString(1) === u2)
    assert(out(2L).getLong(2) === 1L && out(2L).getLong(3) === 20L)
    assert(out(3L).getString(1) === "completely different text here!")
    assert(out(3L).getLong(2) === 0L && out(3L).getLong(3) === 0L)
  }

  test("stripDuplicatedSpans: disjoint spans keep the gap; self-repeating " +
      "doc empties; accounting matches lengths") {
    val s1 = "AAAABBBBCCCCDDDD" // 16 chars, no internal 10-gram repeat
    val s2 = "WWWWXXXXYYYYZZZZ"
    val df = Seq(
      (1L, s1 + "-middle-keep-" + s2),
      (2L, s1 + "||||" + s2), // same spans, different gap
      (3L, "aaaaaaaaaaaaaaa")  // 15-char self-run: every window repeats
    ).toDF("doc_id", "text")
    val texts = Map(1L -> (s1 + "-middle-keep-" + s2),
      2L -> (s1 + "||||" + s2), 3L -> "aaaaaaaaaaaaaaa")
    val out = TextAnalysis.stripDuplicatedSpans(df, "doc_id", "text", k = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) === "-middle-keep-")
    assert(out(1L).getLong(2) === 2L && out(1L).getLong(3) === 32L)
    assert(out(2L).getString(1) === "||||")
    assert(out(3L).getString(1) === "")
    assert(out(3L).getLong(2) === 1L && out(3L).getLong(3) === 15L)
    // removal accounting: chars removed == length delta, every doc
    out.foreach { case (id, r) =>
      assert(texts(id).length - r.getString(1).length === r.getLong(3),
        s"doc $id accounting")
    }
  }

  test("stripDuplicatedSpans: null-id and null-text docs pass through " +
      "unjudged (NULL stats, text unchanged)") {
    val run = "bbbbbbbbbbbbbbbbbbbbbbbbbbbbbb"
    val df = Seq(
      (Option.empty[Long], Some(run)),
      (Some(1L), Option.empty[String]),
      (Some(2L), Some("plain unique attributable text"))
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.stripDuplicatedSpans(df, "doc_id", "text", k = 10)
      .collect()
    val nullId = rows.find(_.isNullAt(0)).get
    assert(nullId.getString(1) === run) // unchanged, even though self-dup
    assert(nullId.isNullAt(2) && nullId.isNullAt(3))
    val nullText = rows.find(r => !r.isNullAt(0) && r.getLong(0) == 1L).get
    assert(nullText.isNullAt(1) && nullText.isNullAt(2) && nullText.isNullAt(3))
    val judged = rows.find(r => !r.isNullAt(0) && r.getLong(0) == 2L).get
    assert(judged.getString(1) === "plain unique attributable text")
    assert(judged.getLong(2) === 0L)
  }

  test("stripDuplicatedSpans stride > 1 removes a subset of exact removal") {
    val shared = "the exact same forty characters repeated" // 40 chars
    val df = Seq((1L, shared + " then doc one tail"),
      (2L, "doc two head then " + shared)).toDF("doc_id", "text")
    val exact = TextAnalysis.stripDuplicatedSpans(df, "doc_id", "text",
        k = 10).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val strided = TextAnalysis.stripDuplicatedSpans(df, "doc_id", "text",
        k = 10, stride = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3))))
      .toMap
    Seq(1L, 2L).foreach { id =>
      assert(strided(id)._2 > 0L, "strided scrub must still cut the span")
      assert(strided(id)._2 <= exact(id), "strided removal is a lower bound")
      // the lower-bound scrub still reassembles consistently
      assert(strided(id)._1.length === 58 - strided(id)._2,
        s"doc $id length accounting")
    }
  }

  test("cosine pairs: identical, near, orthogonal vectors") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.cosinePairs(emb, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-12)
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("contentDiff classifies snapshot contents; null text is one content, not a phantom pair") {
    val v1 = Seq((1L, "kept body"), (2L, "dropped body"), (3L, "kept body"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v2 = Seq((10L, "kept body"), (11L, "fresh body"),
      (12L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.contentDiff(v1, v2, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // distinct contents: v1 {kept, dropped, NULL}, v2 {kept, fresh, NULL}
    // — ids 1 and 3 collapse to one content; NULL text matches NULL text
    // (an equi-join would report it both added AND removed)
    assert(out === Map("retained" -> 2L, "removed" -> 1L, "added" -> 1L))
  }

  test("cdcChunkStats: identical docs fully dup; cut points are content-defined") {
    // long enough that the mod-16 boundary test cuts several chunks
    val block = (1 to 30).map(i => f"token$i%02d").mkString(" ") // 260 chars
    val df = Seq(
      (1L, block),                 // identical pair: every chunk dups
      (2L, block),
      (3L, "entirely different content with no shared blocks at all ok")
    ).toDF("doc_id", "text")
    val out = Dedup.cdcChunkStats(df, "doc_id", "text", w = 8, avgChunk = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val (n1, d1, c1, f1) = out(1L)
    assert(n1 > 1L, s"mod-16 cutting should split 260 chars, got $n1 chunk(s)")
    assert(d1 === n1 && c1 === block.length.toLong && f1 === 1.0,
      s"identical docs must be fully duplicated chunk-wise: $out")
    assert(out(1L) === out(2L))
    assert(out(3L)._2 === 0L && out(3L)._4 === 0.0)
  }

  test("cdcChunkStats: a copied block chunks identically at any alignment") {
    val copied = (1 to 40).map(i => f"word$i%03d").mkString(" ") // 320 chars
    val df = Seq(
      (1L, copied + " plus a unique tail here"),
      (2L, "a totally different and much longer prefix before! " + copied)
    ).toDF("doc_id", "text")
    val out = Dedup.cdcChunkStats(df, "doc_id", "text", w = 8, avgChunk = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // the block sits at offset 1 in doc1 and offset 53 in doc2: cut
    // points inside it derive from content alone, so its interior
    // chunks agree and dedupe despite the shifted alignment
    assert(out(1L) > 0L && out(2L) > 0L,
      s"shifted copy must still share interior chunks: $out")
  }

  test("cdcChunkStats: short docs form one whole-doc chunk; null id is NULL") {
    val df = Seq(
      (Some(1L), "tiny"), (Some(2L), "tiny"),  // < w: whole-doc chunks, dup
      (Some(3L), "x"),                          // unique short doc
      (Option.empty[Long], "tiny")              // null id: excluded
    ).toDF("doc_id", "text")
    val rows = Dedup.cdcChunkStats(df, "doc_id", "text", w = 8, avgChunk = 16)
      .collect()
    val out = rows.filter(!_.isNullAt(0)).map(r => r.getLong(0) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(1L) === ((1L, 1L, 4L, 1.0)))   // whole-doc chunk, duplicated
    assert(out(2L) === out(1L))
    assert(out(3L) === ((1L, 0L, 0L, 0.0)))
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(2) && nullRow.isNullAt(5),
      "null-id doc must report NULL stats, and must NOT have joined the " +
        "digest pool (its 'tiny' did not make doc 3 dirty)")
  }

  // ------------------------------------------------------------------
  // Adversarial skew fixtures: a value shared by 30%+ of the corpus
  // must not turn any candidate stream quadratic when the guard is on.
  // ------------------------------------------------------------------

  test("skew guard: maxBucketSize bounds a 30%-identical LSH corpus") {
    // 60 of 200 docs carry IDENTICAL text — identical signatures, so
    // every band puts all 60 in one bucket: b²/2 = 1770 candidate
    // pairs from a cluster that carries no discriminative signal.
    val skewText = "all rights reserved contact the site administrator " +
      "for further information about licensing and reuse of this content"
    val rows = (1L to 60L).map(i => (i, skewText)) ++
      (61L to 200L).map(i => (i,
        s"unique document number $i about topic${i % 7} subject${i % 11} " +
          s"theme${i % 13} detail$i specifics$i"))
    val sigs = Dedup.minhashSignatures(rows.toDF("doc_id", "text"),
      "doc_id", "text", ngram = 3, numHashes = 64)
    val skewIds = (1L to 60L).toSet
    val uncapped = Dedup.lshCandidates(sigs, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(uncapped.count { case (a, b) =>
      skewIds(a) && skewIds(b) } === 60 * 59 / 2,
      "without the cap the identical cluster is fully quadratic")
    val capped = Dedup.lshCandidates(sigs, bands = 16,
        maxBucketSize = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!capped.exists { case (a, b) => skewIds(a) && skewIds(b) },
      "an over-cap bucket must emit no intra-cluster pairs")
    assert(capped.length <= 140 * 139 / 2,
      "capped stream is bounded by the non-skew population")
  }

  test("skew guard: maxDocFrequency drops a 40%-shared boilerplate line") {
    // 12 of 30 docs share an 8-token boilerplate line (each token at
    // doc frequency 0.4): unguarded, every boiler-doc pair crosses
    // tau on the shared line ALONE (8 shared / 16 union = 0.5) — 66
    // pairs of unrelated documents. Guarded at 0.3, the boiler tokens
    // drop before the join and only the genuine near-dup pair (rare
    // tokens 3-of-5 after pruning) survives.
    val boiler = "all rights reserved contact us for more information"
    val docs = (
      Seq((1L, s"$boiler alpha beta gamma delta"),
          (2L, s"$boiler alpha beta gamma epsilon")) ++
      (3L to 12L).map(i => (i,
        s"$boiler word${i}a word${i}b word${i}c word${i}d")) ++
      (13L to 30L).map(i => (i,
        s"filler${i}a filler${i}b filler${i}c filler${i}d filler${i}e " +
          s"filler${i}f filler${i}g filler${i}h filler${i}i filler${i}j " +
          s"filler${i}k filler${i}l"))
    ).toDF("doc_id", "text")
    val unguarded = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5,
        maxDocFrequency = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unguarded.count { case (a, b) => a <= 12L && b <= 12L } === 66,
      "unguarded, the boilerplate line alone pairs every boiler doc")
    val guarded = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5,
        maxDocFrequency = Some(0.3))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(guarded.keySet === Set((1L, 2L)),
      "guarded, only the rare-token near-dup pair survives")
    assert(math.abs(guarded((1L, 2L)) - 3.0 / 5.0) < 1e-12,
      "pruned similarity = similarity of the pruned sets, exactly")
  }

  test("skew guard: maxBucketSize bounds a 40%-constant embedding cluster") {
    // 20 of 50 vectors are IDENTICAL (a near-constant embedding — the
    // degenerate direction a collapsed encoder emits): every sign-LSH
    // table puts the whole cluster in one bucket. The genuine near-dup
    // pair in a distinct direction must survive the cap.
    val dim = 16
    def gen(seed: Int): Array[Double] = Array.tabulate(dim) { i =>
      (((seed * 2654435761L + i * 40503L) & 0xffffL).toDouble / 65536.0) * 2.0 - 1.0
    }
    val constant = gen(999)
    val nearA = gen(1234)
    val nearB = nearA.zipWithIndex.map { case (x, i) =>
      if (i == 0) x + 1e-4 else x }
    val rows = (1L to 20L).map(i => (i, constant)) ++
      Seq((21L, nearA), (22L, nearB)) ++
      (23L to 50L).map(i => (i, gen(i.toInt)))
    val df = rows.toDF("vec_id", "embedding")
    val clusterIds = (1L to 20L).toSet
    val uncapped = Dedup.cosinePairsBlocked(df, "vec_id", "embedding",
        tau = 0.9, tables = 16, nPlanes = 8, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.count { case (a, b) =>
      clusterIds(a) && clusterIds(b) } === 20 * 19 / 2,
      "without the cap the constant cluster is fully quadratic")
    assert(uncapped.contains((21L, 22L)))
    val capped = Dedup.cosinePairsBlocked(df, "vec_id", "embedding",
        tau = 0.9, tables = 16, nPlanes = 8, dim = dim,
        maxBucketSize = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists { case (a, b) => clusterIds(a) && clusterIds(b) },
      "an over-cap bucket must emit no intra-cluster pairs")
    assert(capped.contains((21L, 22L)),
      "the genuine near-dup pair in its own direction survives the cap")
  }

  test("semDedup: within-cell dups merge, cross-cell near-dups stay apart, " +
       "survivor is farthest from centroid") {
    // two orthogonal centroids; all vectors are near one or the other
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // cell 0: 1,2 are near-identical (merge); 3 is distinct (singleton).
    // id 2 sits farther from the centroid than id 1 -> survivor = 2.
    // cell 1: 10, 11 near-identical -> merge; 11 farther -> survivor 11.
    // ids 20 (cell 0) and 21 (cell 1): cosine(v20, v21) is high but they
    // assign to DIFFERENT cells -> they must NOT merge (the SemDeDup
    // blocking semantic).
    val rows = Seq(
      (1L, Array(1.0, 0.02)), (2L, Array(1.0, 0.06)), (3L, Array(1.0, 0.5)),
      (10L, Array(0.02, 1.0)), (11L, Array(0.06, 1.0)),
      (20L, Array(1.0, 0.95)), (21L, Array(0.95, 1.0)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Dedup.semDedupWith(df, "vec_id", "embedding", centroids,
        tau = 0.998)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // components label by min id
    assert(out(1L) === ((0L, 2L, 2L)), "1+2 merge in cell 0, survivor 2")
    assert(out(10L) === ((1L, 2L, 11L)), "10+11 merge in cell 1, survivor 11")
    assert(out(3L) === ((0L, 1L, 3L)), "3 is a singleton")
    // 20 and 21 are singletons BECAUSE of cells: their exact cosine is
    // above tau yet they assign to different cells and never pair
    val c = {
      val a = Array(1.0, 0.95); val b = Array(0.95, 1.0)
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(c > 0.998, "fixture: the cross-cell pair IS above tau")
    assert(out(20L) === ((0L, 1L, 20L)) && out(21L) === ((1L, 1L, 21L)),
      "above-tau pair in different cells must NOT merge")
  }

  test("semDedup: maxCellSize excludes over-cap cells from pairing only") {
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // cell 0 holds 10 near-identical vectors (over cap); cell 1 holds a
    // genuine pair under cap
    val rows = (1L to 10L).map(i => (i, Array(1.0, 0.001 * i))) ++
      Seq((20L, Array(0.01, 1.0)), (21L, Array(0.012, 1.0)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Dedup.semDedupWith(df, "vec_id", "embedding", centroids,
        tau = 0.99, maxCellSize = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.filter(_._1 <= 10L).values.forall(_ === 1L),
      "over-cap cell members all stay singletons")
    assert(out(20L) === 2L, "the under-cap cell still merges its pair")
    // all 12 members present exactly once across components
    val total = Dedup.semDedupWith(df, "vec_id", "embedding", centroids,
        tau = 0.99, maxCellSize = Some(5))
      .agg(org.apache.spark.sql.functions.sum("cluster_size")).head.getLong(0)
    assert(total === 12L)
  }

  test("semDedup: malformed vectors (wrong dim, null element) are excluded") {
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val rows: Seq[(Long, Seq[Option[Double]])] = Seq(
      (1L, Seq(Some(1.0), Some(0.1))),
      (2L, Seq(Some(1.0), Some(0.12))),
      (90L, Seq(Some(1.0))), // wrong dim
      (91L, Seq(Some(1.0), None))) // null element
    val df = rows.toDF("vec_id", "embedding")
    val out = Dedup.semDedupWith(df, "vec_id", "embedding", centroids,
      tau = 0.99)
    val ids = out.select("survivor").as[Long].collect().toSet
    assert(ids === Set(2L), "only the valid pair appears, merged")
  }

  test("bloom decontamination is exactly the exact path's output") {
    val bench = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "machine learning benchmarks must never leak into training"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today indeed"), // hit
      (101L, "a totally clean document about gardening and soil health"),
      (102L, "machine learning benchmarks must never leak into training sets"), // hit
      (103L, "another clean one on woodworking joints and glue"))
      .toDF("doc_id", "text")
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text",
        ngram = 5, minOverlap = 1L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val bloom = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text",
        ngram = 5, minOverlap = 1L, fpp = 0.01)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(exact === Seq(101L, 103L))
    assert(bloom === exact, "bloom prefilter + exact confirm ≡ exact path")
  }

  test("bloom decontamination: null-id handling matches the exact path") {
    // null ids pool under the null-safe join (all null-id docs share one
    // hit group — by-id decontamination cannot tell them apart); the
    // bloom path must reproduce the exact path's behavior bit for bit
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (java.lang.Long.valueOf(100L), "clean text one two three four five six"),
      (null.asInstanceOf[java.lang.Long], "alpha beta gamma delta epsilon zeta"),
      (null.asInstanceOf[java.lang.Long], "clean null doc seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text",
        ngram = 5, minOverlap = 1L)
      .select("text").as[String].collect().toSet
    val bloom = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text",
        ngram = 5, minOverlap = 1L)
      .select("text").as[String].collect().toSet
    assert(exact.contains("clean text one two three four five six"))
    assert(!exact.contains("alpha beta gamma delta epsilon zeta"),
      "the contaminated null-id doc is removed by the exact path")
    assert(bloom === exact, "bloom path ≡ exact path on null ids")
  }

  test("digest bloom has no false negatives and prunes clean shingles") {
    val bench = Seq((1L, (1 to 50).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val catalog = Dedup.benchmarkDigests(bench, "doc_id", "text", ngram = 5)
    val bf = Dedup.digestBloom(catalog, fpp = 0.01)
    // every true digest must pass the gate (Bloom's contract)
    import org.apache.spark.sql.functions._
    val misses = catalog.digests
      .filter(!graft.functions.Blooms.mightContainLong(
        conv(substring(col("d"), 1, 15), 16, 10).cast("long"), bf))
      .count()
    assert(misses === 0L, "a bloom filter must never miss a true member")
    // a disjoint-vocabulary corpus should be (almost entirely) pruned
    val clean = Seq((2L, (1 to 200).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cleanDigests = Dedup.benchmarkDigests(clean, "doc_id", "text", 5).digests
    val passed = cleanDigests
      .filter(graft.functions.Blooms.mightContainLong(
        conv(substring(col("d"), 1, 15), 16, 10).cast("long"), bf))
      .count()
    val totalClean = cleanDigests.count()
    assert(passed < totalClean / 2,
      s"fpp=0.01 gate must prune most clean shingles ($passed/$totalClean passed)")
  }

  test("lshRecallAudit: exact duplicates give recall 1; caught set " +
      "matches an independent driver-side banding check") {
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.lshRecallAudit(real, "doc_id", "text", tau = 0.5,
        ngram = 3, numHashes = 64, bands = 16, sampleSize = 40)
      .collect().head
    assert(out.getLong(0) === 40L, "sample must be size-bounded")
    val (nTrue, nCand, nCaught) =
      (out.getLong(1), out.getLong(2), out.getLong(3))
    assert(nCaught <= math.min(nTrue, nCand))
    if (nTrue > 0) assert(out.getDouble(4) === nCaught.toDouble / nTrue)
    // independent check of the candidate side: replay banding from
    // collected signatures of the SAME sample and compare the caught
    // count against the exact pairs from jaccardPairs on that sample
    import org.apache.spark.sql.functions._
    val sample = real
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .withColumn("__h",
        md5(concat(lit("graft-audit:"), col("doc_id").cast("string"))))
      .orderBy(col("__h"), col("doc_id")).limit(40).drop("__h")
    val sigs = Dedup.minhashSignatures(sample, "doc_id", "text", 3, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def collide(a: Long, b: Long): Boolean =
      (0 until 16).exists(band => (0 until 4).forall(j =>
        sigs(a)(band * 4 + j) === sigs(b)(band * 4 + j)))
    val truePairs = Dedup.jaccardPairs(sample, "doc_id", "text", 0.5,
        ngram = 3, maxDocFrequency = None, maxTokenDocs = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nTrue === truePairs.length)
    assert(nCaught === truePairs.count { case (a, b) => collide(a, b) })
    // exact duplicates always collide: a corpus of copies is fully caught
    val copies = (1L to 30L).map(i => (i, base + s" tail${i % 3}"))
      .toDF("doc_id", "text")
    val dup = Dedup.lshRecallAudit(copies, "doc_id", "text", tau = 0.5,
      ngram = 3, numHashes = 64, bands = 16, sampleSize = 30).collect().head
    assert(dup.getLong(1) > 0, "copies must produce true pairs")
    assert(dup.getDouble(4) === 1.0,
      "identical-signature pairs must always be candidates")
    // an all-distinct corpus yields no true pairs and NULL ratios
    val distinctDocs = (1L to 20L)
      .map(i => (i, (0 until 12).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val none = Dedup.lshRecallAudit(distinctDocs, "doc_id", "text",
      tau = 0.5, sampleSize = 20).collect().head
    assert(none.getLong(1) === 0L && none.isNullAt(4),
      "recall must be NULL (not NaN) when there are no true pairs")
  }

  test("lshRecallAuditGrid: rows match single audits; candidates and " +
      "recall monotone in bands") {
    val real = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val grid = Dedup.lshRecallAuditGrid(real, "doc_id", "text", tau = 0.5,
        ngram = 3, numHashes = 64, bandsGrid = Seq(32, 8, 16),
        sampleSize = 40)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toSeq
    assert(grid.map(_._1) === Seq(8, 16, 32), "rows ordered by bands asc")
    // narrower bands can only ADD collisions: a b-band collision means
    // some width-2w slice agrees fully, so both width-w halves agree
    val byBands = grid.toMap
    assert(byBands(8)._2 <= byBands(16)._2 && byBands(16)._2 <= byBands(32)._2,
      s"candidates must be monotone in bands: $grid")
    assert(byBands(8)._3 <= byBands(16)._3 && byBands(16)._3 <= byBands(32)._3,
      s"caught must be monotone in bands: $grid")
    // each grid row is exactly the single-config audit
    for (b <- Seq(8, 16, 32)) {
      val single = Dedup.lshRecallAudit(real, "doc_id", "text", tau = 0.5,
        ngram = 3, numHashes = 64, bands = b, sampleSize = 40).collect().head
      assert((single.getLong(1), single.getLong(2), single.getLong(3))
        === byBands(b), s"grid row bands=$b diverges from single audit")
    }
  }

  // --- character-shingle mode (the CJK blind spot, round 9) ----------

  // Two near-identical Chinese documents (only the final clause
  // differs) plus an unrelated one — no whitespace anywhere, so
  // whitespace tokenization yields exactly ONE token per document and
  // every word-shingled comparison is all-or-nothing.
  private val cjkA =
    "机器学习模型需要大量高质量的训练数据来提升泛化能力并减少过拟合现象"
  private val cjkB =
    "机器学习模型需要大量高质量的训练数据来提升泛化能力并避免过拟合问题"
  private val cjkC =
    "今天的晚餐我们准备了西红柿鸡蛋面和一些新鲜的水果沙拉味道很好"
  private lazy val cjkDocs =
    Seq((1L, cjkA), (2L, cjkB), (3L, cjkC)).toDF("doc_id", "text")

  test("planted CJK near-dups: word shingles MISS, char shingles CATCH") {
    // word mode: each doc is one giant token — the near-dup pair
    // shares zero shingles and no pair survives any tau
    assert(Dedup.jaccardPairs(cjkDocs, "doc_id", "text", 0.3,
      maxDocFrequency = None, maxTokenDocs = None).count() === 0)
    val char = Dedup.jaccardPairs(cjkDocs, "doc_id", "text", 0.3,
        maxDocFrequency = None, maxTokenDocs = None,
        mode = Dedup.ShingleMode.Char)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(char === Set((1L, 2L)),
      s"char shingles must pair exactly the planted near-dup: $char")
  }

  test("char-shingle minhash catches the CJK pair word minhash misses") {
    assert(Dedup.minhashPairs(cjkDocs, "doc_id", "text", 0.3, ngram = 3,
      numHashes = 64, bands = 16).count() === 0)
    val char = Dedup.minhashPairs(cjkDocs, "doc_id", "text", 0.3,
        numHashes = 64, bands = 16, mode = Dedup.ShingleMode.Char)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(char === Set((1L, 2L)))
  }

  test("char-shingle simhash separates CJK near-dups from unrelated") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val char = Dedup.simhashDF(cjkDocs, "doc_id", "text", Dedup.ShingleMode.Char)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val near = ham(char(1L), char(2L))
    val far = math.min(ham(char(1L), char(3L)), ham(char(2L), char(3L)))
    assert(near < far,
      s"char simhash: near-dup hamming $near must beat unrelated $far")
    // simhash's hamming<=3 band-collide regime needs a SMALL edited
    // fraction: a one-char edit in a 4x-longer document perturbs ~5 of
    // ~120 grams, the re-encode-style duplicate the 4x16 banding must
    // catch — while word shingling still sees one giant token per doc
    val longA = cjkA * 4
    val longB = cjkA * 2 + cjkA.replace('减', '降') + cjkA
    val longDocs = Seq((1L, longA), (2L, longB), (3L, cjkC * 4))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(longDocs, "doc_id", "text",
        maxHamming = 3, mode = Dedup.ShingleMode.Char)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)),
      s"char simhash must band-collide exactly the planted pair: $pairs")
    assert(Dedup.simhashPairs(longDocs, "doc_id", "text",
      maxHamming = 3).count() === 0,
      "word simhash is blind to the planted CJK near-dup")
  }

  test("auto mode picks char shingles per CJK doc, word per English doc") {
    val mixed = Seq((1L, base), (2L, cjkA)).toDF("doc_id", "text")
    val auto = Dedup.shinglesByModeDF(mixed, "doc_id", "text", 3,
      Dedup.ShingleMode.Auto)
    val en = auto.filter(org.apache.spark.sql.functions.col("id") === 1L)
      .select("shingle").as[String].collect()
    val zh = auto.filter(org.apache.spark.sql.functions.col("id") === 2L)
      .select("shingle").as[String].collect()
    assert(en.nonEmpty && en.forall(_.split(" ").length == 3),
      "English doc must get word trigrams")
    assert(zh.nonEmpty && zh.forall(s => s.length == 5 && !s.contains(" ")),
      "CJK doc must get 5-char grams")
  }

  test("auto-mode jaccard catches near-dups in BOTH scripts in one call") {
    val mixed = Seq((1L, base), (2L, nearDup), (11L, cjkA), (12L, cjkB),
      (21L, unrelated), (22L, cjkC)).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(mixed, "doc_id", "text", 0.3, ngram = 3,
        maxDocFrequency = None, maxTokenDocs = None,
        mode = Dedup.ShingleMode.Auto)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (11L, 12L)),
      s"one auto call must find the English AND the CJK pair: $pairs")
  }

  test("lshAutoRecommend: the word-mode 16×4 point on char shingles is " +
      "rejected (candidate flood), the q127 8×8 point is recommended") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum => sqlSum}
    // The round-10 74 GB spill corpus shape in miniature: unrelated
    // documents whose char-5-gram Jaccard runs ~0.5 (a long shared
    // boilerplate span + a unique pseudo-random tail), far below the
    // tau=0.8 dup threshold but far above word-trigram background.
    // At 16 bands × width 4 the S-curve admits ~60% of ALL pairs as
    // candidates (flood); at 8 × 8 it admits ~2%.
    val shared = "the quick brown fox jumps over the lazy dog while " +
      "autumn leaves drift across the quiet village square and distant " +
      "bells ring softly through the evening mist above the harbor as " +
      "fishermen mend their nets beside weathered boats and children " +
      "chase gulls along the shore before supper"
    val md = java.security.MessageDigest.getInstance("MD5")
    def tail(i: Int): String = (0 until 5).map { j =>
      md.digest(s"tail:$i:$j".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    }.mkString(" ")
    val docs = (1 to 60).map(i => (i.toLong, s"$shared ${tail(i)}"))
      .toDF("doc_id", "text")
    val rec = Dedup.lshAutoRecommend(docs, "doc_id", "text", tau = 0.8,
        numHashes = 64, bandsGrid = Seq(8, 16, 32),
        mode = Dedup.ShingleMode.Char, charK = 5,
        recallFloor = 0.7, maxPairsPerDoc = 2.0)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(rec.keySet === Set(8, 16, 32), "one row per grid config")
    val (r8, r16, r32) = (rec(8), rec(16), rec(32))
    // S-curve recall floors at tau=0.8: all three configs clear 0.7
    assert(r8.getDouble(2) === 0.769889 && r16.getDouble(2) > 0.99,
      s"p_at_tau cells: ${r8.getDouble(2)}, ${r16.getDouble(2)}")
    // the flood: 16×4 and 32×2 blow the pairs-per-doc cap, 8×8 doesn't
    assert(r16.getInt(7) === 0 && r32.getInt(7) === 0,
      s"word-mode banding must be INFEASIBLE on char shingles: " +
        s"16→${r16.getDouble(6)} 32→${r32.getDouble(6)} pairs/doc")
    assert(r8.getInt(7) === 1 && r8.getInt(8) === 1,
      s"the q127 8×8 operating point must be recommended: " +
        s"${r8.getDouble(6)} pairs/doc")
    assert(Seq(r8, r16, r32).map(_.getInt(8)).sum === 1,
      "exactly one recommended config")
    assert(r16.getDouble(6) > r8.getDouble(6) * 5,
      "the flood must be an order-of-magnitude call, not a margin call")
    // predicted volume is exactly the bucket histogram's pair sum
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text",
      numHashes = 64, mode = Dedup.ShingleMode.Char, charK = 5)
    val histPairs = Dedup.lshBucketHistogram(sigs, 16)
      .agg(sqlSum(col("pairs"))).as[Long].head()
    assert(r16.getLong(4) === histPairs,
      "predicted_candidates must equal the histogram pair sum")
  }

  test("crossContainmentGate: subset batch docs gate, undecidables keep a null-partner row") {
    import spark.implicits._
    val catalog = Seq(
      (1L, "a b c d e f g h i j"),   // 8 trigrams
      (2L, "m n o p q r")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "c d e f g"),           // 3 trigrams, all inside doc 1
      (101L, "a b c q r s t u v w"), // 1 of 8 trigrams shared with doc 1
      (102L, "z y x w v"),           // no overlap at all
      (103L, null.asInstanceOf[String]) // undecidable
    ).toDF("doc_id", "text")
    val out = Dedup.crossContainmentGate(batch, catalog, "doc_id", "text",
        tau = 0.8)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3)))).toMap
    assert(out(100L) === ((Some(1L), Some(1.0), 1)),
      "a batch doc fully inside a catalog doc must gate")
    assert(out(101L) === ((Some(1L), Some(0.125), 0)),
      "a weak overlap reports its best partner but passes")
    assert(out(102L)._1.isEmpty && out(102L)._3 === 0,
      "no shared shingle: null partner, passes")
    assert(out(103L) === ((None, None, 0)),
      "an undecidable (null text) doc keeps its verdict row")
    assert(out.size === 4, "one verdict per batch doc, catalog emits none")
    // non-long ids must survive the verdict join (no silent cast)
    val sOut = Dedup.crossContainmentGate(
        Seq(("b1", "c d e f g")).toDF("doc_id", "text"),
        Seq(("c1", "a b c d e f g h i j")).toDF("doc_id", "text"),
        "doc_id", "text", tau = 0.8,
        maxDocFrequency = None, maxTokenDocs = None)
      .collect()
    assert(sOut.length === 1 && sOut.head.getString(1) === "c1" &&
      sOut.head.getInt(3) === 1, "string ids gate identically")
  }
}
