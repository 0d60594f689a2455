package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf100 flood diagnosis for q104 (cosinePairsBlocked) and q133
  * (minhashPairs → connectedComponents) — HISTOGRAMS ONLY, never the
  * pair streams themselves (the lshBucketHistogram pricing rule).
  * Run: tools/runjava.sh graft.ext.DiagMain <sfDir> [emb|doc|pairs]
  * Throwaway test-scope tooling; the findings land in SCALE.md.
  */
object DiagMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val what = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder()
      .appName("graft-diag")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (what == "emb" || what == "all") {
      val emb = graft.io.Tables.embeddings(spark, dir)
      val n = emb.count()
      val planes = Similarity.adaptivePlanes(n)
      println(s"== q104 emb: n=$n adaptivePlanes=$planes tables=16")
      val buckets = Similarity.signLshBuckets(
        emb, "vec_id", "embedding", tables = 16, nPlanes = planes, dim = 64)
      val sizes = buckets.groupBy("table", "bucket")
        .agg(count(lit(1)).as("bsz"))
      val hist = sizes.groupBy("bsz").agg(count(lit(1)).as("n_buckets"))
        .withColumn("pairs",
          (col("n_buckets") * col("bsz") * (col("bsz") - 1) / 2).cast("long"))
        .orderBy(col("bsz").desc)
      hist.show(30, truncate = false)
      val agg = hist.agg(
        sum(when(col("bsz") <= 1000, col("pairs"))).as("pairs_under_cap"),
        sum(col("pairs")).as("pairs_uncapped"),
        sum(when(col("bsz") > 1000, col("n_buckets"))).as("buckets_dropped"),
        max(col("bsz")).as("max_bsz")).collect()(0)
      println(s"== q104 pairs_under_cap=${agg.get(0)} uncapped=${agg.get(1)} " +
        s"dropped_buckets=${agg.get(2)} max_bsz=${agg.get(3)}")
    }

    if (what == "doc" || what == "all") {
      val docs = graft.io.Tables.documents(spark, dir)
        .filter(col("doc_id").isNotNull)
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text",
        ngram = 3, numHashes = 64).localCheckpoint(true)
      println("== q133/q17 minhash 64x16 bucket histogram (top 30 sizes)")
      val hist = Dedup.lshBucketHistogram(sigs, bands = 16)
      hist.show(30, truncate = false)
      val agg = hist.agg(
        sum(when(col("bsz") <= 1000, col("pairs"))).as("pairs_under_cap"),
        sum(col("pairs")).as("pairs_uncapped"),
        sum(when(col("bsz") > 1000, col("n_buckets"))).as("buckets_dropped"),
        max(col("bsz")).as("max_bsz")).collect()(0)
      println(s"== q133 pairs_under_cap=${agg.get(0)} uncapped=${agg.get(1)} " +
        s"dropped_buckets=${agg.get(2)} max_bsz=${agg.get(3)}")
    }

    if (what == "pairs" || what == "all") {
      val docs = graft.io.Tables.documents(spark, dir)
        .filter(col("doc_id").isNotNull)
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        tau = 0.5, ngram = 3, numHashes = 64, bands = 16,
        maxBucketSize = Some(1000))
      val n = pairs.count()
      println(s"== q133 edge count (minhashPairs est>=0.5): $n " +
        s"(driver union-find gate = 2000000)")
    }

    spark.stop()
  }
}
