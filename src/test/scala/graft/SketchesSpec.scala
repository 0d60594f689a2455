package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force twin of the heavyHitters contract: exact n-gram
    * counts, keep cnt·(capacity+1) > N, top k by (cnt desc, term
    * asc) — computed the expensive way (full groupBy) so the sketch
    * path has an independent in-suite anchor besides the DuckDB
    * oracle. */
  private def bruteForce(df: DataFrame, k: Int, ngram: Int,
                         capacity: Int): Seq[(String, Long)] = {
    val toks = filter(split(lower(col("text")), "[ \\t\\n\\f\\r]+"),
      t => length(t) > 0)
    val grams =
      if (ngram == 1) toks
      else when(size(toks) >= ngram,
          transform(sequence(lit(1), size(toks) - (ngram - 1)),
            i => concat_ws(" ", slice(toks, i, lit(ngram)))))
        .otherwise(array().cast("array<string>"))
    val g = df.select(explode(grams).as("term"))
    val n = g.count()
    g.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(capacity.toLong + 1L) > lit(n))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
      .as[(String, Long)].collect().toSeq
  }

  private def run(df: DataFrame, k: Int, ngram: Int,
                  capacity: Int): Seq[(String, Long)] =
    Sketches.heavyHitters(df, "text", k, ngram, capacity)
      .as[(String, Long)].collect().toSeq

  test("MG survival guarantee holds under adversarial merge orders") {
    // one hot term at just over N/(capacity+1) of a 10k-occurrence
    // stream, buried in distinct distractors that force constant
    // decrements; sketch in chunks and merge forward, backward and
    // pairwise — the hot term must survive every order.
    val cap = 16
    val hot = 700 // N = 10_000, N/(cap+1) ≈ 588
    val stream = new scala.util.Random(7).shuffle(
      (Seq.fill(hot)("hot") ++ (0 until (10000 - hot)).map(i => s"d$i")).toVector)
    val chunks = stream.grouped(500).map { ch =>
      val m = mutable.HashMap.empty[String, Long]
      ch.foreach(t => Sketches.mgAdd(m, t, cap))
      m
    }.toVector
    def clone0(v: Vector[mutable.HashMap[String, Long]]) = v.map(_.clone())
    val fwd = clone0(chunks).reduceLeft(Sketches.mgMerge(_, _, cap))
    val bwd = clone0(chunks).reduceRight(Sketches.mgMerge(_, _, cap))
    val tree = {
      var level = clone0(chunks)
      while (level.size > 1)
        level = level.grouped(2).map {
          case Vector(a, b) => Sketches.mgMerge(a, b, cap)
          case Vector(a)    => a
        }.toVector
      level.head
    }
    for ((m, lbl) <- Seq((fwd, "fwd"), (bwd, "bwd"), (tree, "tree"))) {
      assert(m.contains("hot"), s"$lbl merge lost an above-threshold term")
      assert(m.size <= cap, s"$lbl merge exceeded capacity")
      // stored count never exceeds true count (only decrements applied)
      assert(m("hot") <= hot.toLong, s"$lbl overcounted")
    }
  }

  test("heavy hitters equal the brute-force contract on a skewed corpus") {
    // zipf-ish: token t{i} drawn with weight ~ 1/(i+1); 400 docs x 60
    // tokens, 8 partitions so the tree merge is exercised.
    val rnd = new scala.util.Random(42)
    val vocabWeights = (0 until 500).map(i => 1.0 / (i + 1))
    val cum = vocabWeights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def draw(): String = {
      val u = rnd.nextDouble() * total
      s"t${cum.indexWhere(_ >= u)}"
    }
    val docs = (0 until 400).map { i =>
      (i.toLong, (0 until 60).map(_ => draw()).mkString(" "))
    }.toDF("doc_id", "text").repartition(8)
    docs.cache().count()
    for ((ngram, cap) <- Seq((1, 64), (1, 16), (2, 128))) {
      val got = run(docs, k = 10, ngram = ngram, capacity = cap)
      val want = bruteForce(docs, k = 10, ngram = ngram, capacity = cap)
      assert(got === want, s"ngram=$ngram capacity=$cap")
    }
    docs.unpersist()
  }

  test("tiny capacity on heavy skew still matches brute force exactly") {
    // half the stream is one term; capacity barely above k. the
    // candidate set is order-dependent at this size — the exact
    // threshold filter must still make the OUTPUT deterministic.
    // N = 200·9 = 1800 occurrences; threshold N/(cap+1) = 360.
    // alpha (600) must appear under every merge order; beta (200) and
    // the distinct fillers are below threshold and must not.
    val docs = (0 until 200).map { i =>
      val filler = (0 until 5).map(j => s"u${i}_$j").mkString(" ")
      (i.toLong, s"alpha alpha alpha beta $filler")
    }.toDF("doc_id", "text").repartition(16)
    val got = run(docs, k = 3, ngram = 1, capacity = 4)
    val want = bruteForce(docs, k = 3, ngram = 1, capacity = 4)
    assert(got === want)
    assert(got === Seq(("alpha", 600L)))
  }

  test("empty and too-short documents yield an empty result") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(run(empty, 5, 1, 16).isEmpty)
    val short = Seq((1L, "solo"), (2L, ""), (3L, "  ")).toDF("doc_id", "text")
    // ngram=2: no doc has 2 words -> empty stream -> empty result
    assert(run(short, 5, 2, 16).isEmpty)
    // ngram=1: "solo" is the only occurrence, 1*17 > 1 -> it appears
    assert(run(short, 5, 1, 16) === Seq(("solo", 1L)))
  }

  test("parameter validation fails loudly") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Sketches.heavyHitters(df, "text", k = 0))
    intercept[IllegalArgumentException](Sketches.heavyHitters(df, "text", ngram = 0))
    intercept[IllegalArgumentException](
      Sketches.heavyHitters(df, "text", k = 10, capacity = 5))
  }

  // ---------------- KMV / theta sketch ----------------

  test("kmvMerge is a set bottom-k: sorted, distinct, bounded, order-free") {
    val rnd = new scala.util.Random(11)
    val a = Array.fill(40)(rnd.nextLong().abs % 1000).distinct.sorted
    val b = Array.fill(40)(rnd.nextLong().abs % 1000).distinct.sorted
    val m = Sketches.kmvMerge(a, b, 16)
    val want = (a ++ b).distinct.sorted.take(16)
    assert(m.toSeq === want.toSeq)
    assert(Sketches.kmvMerge(b, a, 16).toSeq === want.toSeq)
    assert(Sketches.kmvMerge(a, Array.empty[Long], 16).toSeq ===
      a.sorted.take(16).toSeq)
    assert(Sketches.kmvMerge(Array.empty[Long], Array.empty[Long], 16).isEmpty)
  }

  test("kmvSketch equals brute-force bottom-k distinct across partitions") {
    val rnd = new scala.util.Random(5)
    // duplicates on purpose: the sketch must dedup, not just truncate
    val vals = (0 until 5000).map(_ => (rnd.nextLong().abs % 700))
    val df = vals.toDF("h").repartition(16)
    val got = Sketches.kmvSketch(df, "h", 64)
    val want = vals.distinct.sorted.take(64)
    assert(got.toSeq === want)
    // k larger than the support: the sketch IS the support
    val all = Sketches.kmvSketch(df, "h", 100000)
    assert(all.toSeq === vals.distinct.sorted)
    // repeat run: deterministic under Spark's merge order
    assert(Sketches.kmvSketch(df, "h", 64).toSeq === want)
  }

  test("kmvCompare: exact branch when the union support fits k") {
    // two overlapping small universes, well under k=256: every
    // estimate must EQUAL its exact column (the not-full branch).
    val a = (0 until 100).map(i => i.toLong).toDF("h")
    val b = (60 until 180).map(i => i.toLong).toDF("h")
    val r = Sketches.kmvCompare(a, b, "h", 256).collect().head
    assert(r.getAs[Long]("da_exact") === 100L)
    assert(r.getAs[Double]("da_est") === 100.0)
    assert(r.getAs[Long]("db_exact") === 120L)
    assert(r.getAs[Double]("db_est") === 120.0)
    assert(r.getAs[Long]("union_exact") === 180L)
    assert(r.getAs[Double]("union_est") === 180.0)
    assert(r.getAs[Long]("inter_exact") === 40L)
    assert(r.getAs[Double]("inter_est") === 40.0)
    assert(r.getAs[Double]("jaccard_est") ===
      math.floor(40.0 / 180.0 * 1e6) / 1e6)
  }

  test("kmvCompare: estimator branch lands near truth on a big universe") {
    // md5-derived hashes over a 30k/24k-universe pair with a planted
    // 12k-element intersection; k=256 → expected rel. error ~1/√k ≈
    // 6%. Assert a loose 25% band (deterministic data, so this can't
    // flake) plus the structural invariants.
    def hashed(tag: String, n: Int, shared: Int) =
      ((0 until shared).map(i => s"shared:$i") ++
        (0 until (n - shared)).map(i => s"$tag:$i"))
        .toDF("t")
        .select(conv(substring(md5(col("t")), 1, 15), 16, 10)
          .cast("long").as("h"))
    val a = hashed("a", 30000, 12000).repartition(8)
    val b = hashed("b", 24000, 12000).repartition(8)
    val r = Sketches.kmvCompare(a, b, "h", 256).collect().head
    def relErr(est: Double, exact: Long) = math.abs(est - exact) / exact
    assert(r.getAs[Long]("da_exact") === 30000L)
    assert(r.getAs[Long]("inter_exact") === 12000L)
    assert(relErr(r.getAs[Double]("da_est"), 30000L) < 0.25)
    assert(relErr(r.getAs[Double]("db_est"), 24000L) < 0.25)
    assert(relErr(r.getAs[Double]("union_est"), 42000L) < 0.25)
    assert(relErr(r.getAs[Double]("inter_est"), 12000L) < 0.40)
    assert(math.abs(r.getAs[Double]("jaccard_est") - 12000.0 / 42000.0) < 0.1)
    // determinism: the whole row reproduces bit-for-bit
    val r2 = Sketches.kmvCompare(a, b, "h", 256).collect().head
    assert(r.toSeq === r2.toSeq)
  }

  test("kmvCompare: both slices empty — 0/0 guarded, never NaN") {
    // The degenerate case: union_exact = 0 would make jaccard_exact
    // 0.0/0.0 = NaN, and Spark's floor(NaN) = 0 while DuckDB's stays
    // NaN — the guard must snap BOTH jaccard columns to 0.0 instead.
    val empty = Seq.empty[Long].toDF("h")
    val r = Sketches.kmvCompare(empty, empty, "h", 256).collect().head
    assert(r.getAs[Long]("union_exact") === 0L)
    assert(r.getAs[Double]("jaccard_exact") === 0.0)
    assert(r.getAs[Double]("jaccard_est") === 0.0)
    assert(!r.getAs[Double]("jaccard_exact").isNaN)
  }
}
