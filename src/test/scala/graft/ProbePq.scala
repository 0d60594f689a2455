package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch probe: PQ trainer vs encode wall-clock at bench settings. */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.graft.scan.minPartitions", 32)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    io.Tables.lineitem(spark, sfDir).count() // warm
    val emb = io.Tables.embeddings(spark, sfDir)
    for (m <- Seq(8, 16)) {
      var t0 = System.nanoTime()
      val books = graft.ext.Similarity.trainPqCodebooks(
        emb, "vec_id", "embedding", 64, m, 16, 0.25, 42L)
      println(f"train m=$m ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
      graft.ext.Similarity.pqQuantizeWith(emb, "vec_id", "embedding", 64, books).count()
      println(f"encode m=$m ${(System.nanoTime() - t0) / 1e9}%.2fs")
      if (m == 16) {
        t0 = System.nanoTime()
        graft.ext.Similarity.pqCosineTopKRefinedWith(
          emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          10, 64, books, 16).count()
        println(f"refined-search m=$m ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
