package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal repro of the round-10 sf10 scale bug: char-shingle minhash
  * at (64 hashes, 16 bands) — band width 4, S-curve midpoint
  * (1/16)^(1/4) = 0.5 — floods the candidate join on a REAL corpus.
  * Character 5-gram Jaccard between unrelated documents runs far
  * higher than word-trigram Jaccard (shared substrings like " the "
  * dominate), so a width-4 band collides at rate J⁴ over a fat-J
  * background and the capped buckets still admit ~cap²/2 pairs each:
  * at sf10 the estimate join dragged 2×512 B signatures per candidate
  * through a SortMergeJoin until it filled 74 GB of spill and died.
  * Width-8 bands (8 bands, midpoint (1/8)^(1/8) ≈ 0.77 — the
  * CCNet-style tau=0.8 operating point for char shingles) collapse
  * the background collision rate to J⁸.
  *
  * Usage: ProbeCharMinhashFlood <sfDir>
  * Prints candidate-pair counts per (bands, cap) config.
  */
object ProbeCharMinhashFlood {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.graft.scan.minPartitions", 32)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bandsList =
      if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(16, 8)
    val docs = io.Tables.documents(spark, sfDir)
    val n = docs.count()
    var t0 = System.nanoTime()
    val sigs = ext.Dedup.minhashSignatures(docs, "doc_id", "text",
        numHashes = 64, mode = ext.Dedup.ShingleMode.Char, charK = 5)
      .localCheckpoint(true)
    println(f"docs=$n%d signatures in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    for (bands <- bandsList; cap <- Seq(Some(1000), None)) {
      t0 = System.nanoTime()
      val c = ext.Dedup.lshCandidates(sigs, bands, cap).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"docs=$n%d bands=$bands%d cap=$cap%s candidates=$c%d (${dt}%.1f s)")
      // where do the pairs come from? the bucket-size histogram says
      // whether a few mega-buckets or a sea of cap-sized ones
      val hist = ext.Dedup.lshBucketHistogram(sigs, bands)
      hist.show(20, false)
    }
    spark.stop()
  }
}
