package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: IVF recall@10 vs nProbe on the sf0.001 embeddings
  * fixture (and PQ-ADC recall with/without exact rerank), to pick
  * defaults that clear the 0.9 spec floor. Run:
  * tools/runjava.sh graft.ProbeIvf (needs test-classes on cp)
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", 8)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = real.filter(col("vec_id") < 5L)
    val exact = graft.ext.Similarity
      .bruteForceTopK(real, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println("corpus size = " + real.count())
    for (m <- Seq(4, 8, 16)) {
      val books = graft.ext.Similarity.trainPqCodebooks(
        real, "vec_id", "embedding", dim = 64, m = m, k = 16,
        trainFraction = 0.25, seed = 42L)
      val adc = graft.ext.Similarity
        .pqCosineTopKWith(real, queries, "vec_id", "embedding", 10, 64, books)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ar = (exact intersect adc).size.toDouble / exact.size
      for (rf <- Seq(4, 8, 16)) {
        val t0 = System.nanoTime()
        val ref = graft.ext.Similarity
          .pqCosineTopKRefinedWith(real, queries, "vec_id", "embedding",
            10, 64, books, refine = rf)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val rr = (exact intersect ref).size.toDouble / exact.size
        println(f"m=$m%2d adc=$ar%.3f refine=$rf%2d refined=$rr%.3f  ${dt}%.1fs")
      }
    }
    spark.stop()
  }
}
