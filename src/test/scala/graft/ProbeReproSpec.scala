package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repro-evidence probes, pinned as skipped-by-default TESTS so they
  * can't rot (round-13 brief: the load-bearing Probe* mains encoded
  * scale evidence outside ScalaTest). Each test is gated on
  * `SPARK_GRAFT_RUN_PROBES`: unset, the suite compiles and CANCELS
  * (so API drift still breaks the build); set, it runs the
  * demonstration and prints the tables the retired mains printed.
  *
  * Run:
  *   SPARK_GRAFT_RUN_PROBES=1 sbt "testOnly graft.ProbeReproSpec"
  *   SPARK_GRAFT_PROBE_DIR=data/sf10   # corpus-scale probes; they
  *                                     # cancel when the dir is absent
  *   SPARK_GRAFT_PROBE_ITERS=25        # push the ckpt loop past the
  *                                     # ~17-link cliff
  *
  * Canonical measured numbers live in SCALE.md (round 8c ckpt cliff,
  * round 10 char-banding flood, round 12 q16 broadcast fix); this
  * suite re-demonstrates the SHAPES at whatever scale it is pointed at.
  */
class ProbeReproSpec extends SparkSpec {

  private def probesEnabled = sys.env.contains("SPARK_GRAFT_RUN_PROBES")
  private def probeDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
    "data/sf10")
  private def dirExists = new java.io.File(probeDir).isDirectory

  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  test("ckpt-loop repro: chained localCheckpoint vs PinnedLoop agree, " +
      "PinnedLoop stays flat (SCALE.md round 8c)") {
    assume(probesEnabled, "set SPARK_GRAFT_RUN_PROBES=1 to run probes")
    val iters = sys.env.get("SPARK_GRAFT_PROBE_ITERS").map(_.toInt)
      .getOrElse(14) // default stays below the ~17-link cliff; raise to
                     // 25 to demonstrate the multiplicative re-execution
    // ring graph: worst case for min-label propagation (one long cycle)
    val n = 20000L
    val edges0 = spark.range(n).select(col("id").as("src"),
      ((col("id") + 1) % n).as("dst"))
    val edges = edges0
      .union(edges0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()

    def run(variant: String): (DataFrame, Seq[Double]) = {
      var labels: DataFrame = edges.select(col("src").as("id")).distinct()
        .withColumn("component", col("id")).localCheckpoint()
      val loop =
        if (variant == "rdd") graft.ext.PinnedLoop.start(labels) else null
      val times = (1 to iters).map { it =>
        val t0 = System.nanoTime()
        val nbrMin = edges
          .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("id"))
          .agg(min(col("component")).as("__nmin"))
        val hop = labels.join(nbrMin, Seq("id"), "left_outer")
          .select(col("id"),
            least(col("component"), coalesce(col("__nmin"), col("component")))
              .as("component"))
        val joined = hop.as("x")
          .join(hop.as("y"), col("x.component") === col("y.id"))
          .select(col("x.id").as("id"), col("y.component").as("component"))
        labels = variant match {
          case "lc" => joined.localCheckpoint()
          case _ => loop.advance(joined)
        }
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[ckptloop] $variant iter $it $dt%8.2f s")
        dt
      }
      (labels, times)
    }

    val (lcLabels, _) = run("lc")
    val (rddLabels, rddTimes) = run("rdd")
    // correctness pin: both loop pins compute identical label frames
    assert(lcLabels.orderBy("id").collect().toSeq ===
      rddLabels.orderBy("id").collect().toSeq)
    // the PinnedLoop path must not grow with depth: the last iteration
    // is within noise of the early ones (loose 5x bound — this is a
    // shape pin, the wall-clock evidence lives in SCALE.md)
    val early = rddTimes.slice(1, 4).min
    assert(rddTimes.last < 5 * math.max(early, 0.2),
      s"PinnedLoop per-iter time grew with depth: $rddTimes")
  }

  test("q16 phase timing: shingle/candidate/verify breakdown at a " +
      "corpus-scale dir (SCALE.md rounds 10/12)") {
    assume(probesEnabled, "set SPARK_GRAFT_RUN_PROBES=1 to run probes")
    assume(dirExists, s"$probeDir absent — tools/gen_sf.py regenerates it")
    val df = io.Tables.documents(spark, probeDir)
      .filter(col("doc_id") < 50000)
    time("scan+filter count")(df.count())
    val t0f = graft.ext.Dedup.shinglesByModeDF(df, "doc_id", "text", 3,
      graft.ext.Dedup.ShingleMode.Word, 5).withColumnRenamed("shingle", "tok")
    val t = time("shingle+hash checkpoint")(
      t0f.select(col("id"),
          conv(substring(md5(col("tok")), 1, 15), 16, 10)
            .cast("long").as("tok"))
        .localCheckpoint(true))
    println("  shingle rows: " + t.count())
    val dfreq = t.groupBy("tok").agg(count(lit(1)).as("df"))
    val ordered = time("ordered arrays checkpoint")(
      t.join(dfreq, Seq("tok"))
        .groupBy(col("id"))
        .agg(array_sort(collect_list(struct(col("df"), col("tok"))))
          .as("sorted"))
        .select(col("id"),
          transform(col("sorted"), s => s.getField("tok")).as("toks"))
        .withColumn("n", size(col("toks")))
        .withColumn("plen",
          (col("n") - ceil(lit(0.5) * col("n")) + 1).cast("int"))
        .localCheckpoint(true))
    val prefixes = ordered.select(col("id"), col("n"),
      explode(slice(col("toks"), lit(1), col("plen"))).as("tok"))
    val a = prefixes.select(col("id").as("id_a"), col("tok"))
    val b = prefixes.select(col("id").as("id_b"), col("tok"))
    val cand = time("candidate join")(
      a.join(b, a("tok") === b("tok") && a("id_a") < b("id_b"))
        .select("id_a", "id_b").distinct().localCheckpoint(true))
    println("  candidates: " + cand.count())
    val setsA = ordered.select(col("id").as("id_a"), col("toks").as("toks_a"),
      col("n").as("n_a"))
    val setsB = ordered.select(col("id").as("id_b"), col("toks").as("toks_b"),
      col("n").as("n_b"))
    // EXPLICIT broadcast: the bounded-slice frames keep file-derived
    // size estimates after checkpoint (the round-12 q16 lesson)
    val verify = cand.join(broadcast(setsA), Seq("id_a"))
      .join(broadcast(setsB), Seq("id_b"))
      .withColumn("inter",
        size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
    val pairs = time("verify join")(verify.count())
    println("  pairs: " + pairs)
    assert(pairs > 0, "planted twins must pair at any SF")
  }

  test("char-minhash banding flood: 16x4 floods candidates where 8x8 " +
      "does not (SCALE.md round 10)") {
    assume(probesEnabled, "set SPARK_GRAFT_RUN_PROBES=1 to run probes")
    assume(dirExists, s"$probeDir absent — tools/gen_sf.py regenerates it")
    val docs = io.Tables.documents(spark, probeDir)
    val n = docs.count()
    var t0 = System.nanoTime()
    val sigs = ext.Dedup.minhashSignatures(docs, "doc_id", "text",
        numHashes = 64, mode = ext.Dedup.ShingleMode.Char, charK = 5)
      .localCheckpoint(true)
    println(f"docs=$n%d signatures in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val counts = Seq(16, 8).map { bands =>
      t0 = System.nanoTime()
      val c = ext.Dedup.lshCandidates(sigs, bands, Some(1000)).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"docs=$n%d bands=$bands%d cap=1000 candidates=$c%d ($dt%.1f s)")
      ext.Dedup.lshBucketHistogram(sigs, bands).show(20, truncate = false)
      bands -> c
    }.toMap
    assert(counts(8) <= counts(16),
      "width-8 bands must not admit more background candidates than width-4")
  }
}
