package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe (test scope): stage-level timings for the
  * pair-generating dedup queries. Run:
  * sbt "Test/runMain graft.PerfProbe <sfDir>" */
object PerfProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = io.Tables.documents(s, dir)
    println("docs=" + docs.count())
    println("vocab=" + ext.Dedup.tokensDF(docs, "doc_id", "text").select("tok").distinct().count())
    val sigs = time("minhashSignatures(3gram)") {
      val x = ext.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 128); x.count(); x }
    time("lshCandidates capped") {
      println("pairs=" + ext.Dedup.lshCandidates(sigs, 32, Some(1000)).count()) }
    time("q17 minhashPairs(3gram)") {
      println("pairs=" + ext.Dedup.minhashPairs(docs, "doc_id", "text", 0.5, 3,
        maxBucketSize = Some(1000)).count()) }
    time("q16 jaccardPairs(3gram)") {
      println("pairs=" + ext.Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, 3,
        maxDocFrequency = None).count()) }
    time("q19 cosinePairs codegen") {
      println("pairs=" + ext.Dedup.cosinePairs(io.Tables.embeddings(s, dir),
        "vec_id", "embedding", 0.3).count()) }
    time("q21 lsh topk") {
      val emb = io.Tables.embeddings(s, dir)
      ext.Similarity.lshCosineTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", 10, tables = 12, nPlanes = 4).count() }
    s.stop()
  }
}
