package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch probe: IVF-PQ recall/cost across (nProbe, m, refine). */
object ProbeIvfPq {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[8]").config("spark.sql.shuffle.partitions", 8)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = real.filter(col("vec_id") < 5L)
    val exact = graft.ext.Similarity
      .bruteForceTopK(real, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ctrs = graft.ext.Similarity.trainIvfCentroids(
      real, "vec_id", "embedding", 16, 0.25, 42L)
    for (m <- Seq(8, 16)) {
      val books = graft.ext.Similarity.trainPqCodebooks(
        real, "vec_id", "embedding", 64, m, 16, 0.25, 42L)
      for (np <- Seq(8, 12); rf <- Seq(8, 16)) {
        val t0 = System.nanoTime()
        val got = graft.ext.Similarity.ivfPqTopKWith(
            real, queries, "vec_id", "embedding", 10, 64, np, ctrs, books, rf)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val rc = (exact intersect got).size.toDouble / exact.size
        println(f"m=$m%2d nProbe=$np%2d refine=$rf%2d recall=$rc%.3f ${dt}%.1fs")
      }
    }
    spark.stop()
  }
}
