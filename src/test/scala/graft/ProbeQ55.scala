package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: clean repeated timings for the r4 apparent
  * regressions (q55 2.7x, q3, q56) at bench settings, no other load.
  */
object ProbeQ55 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.graft.scan.minPartitions", 32)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    io.Tables.lineitem(spark, sfDir).count() // warm
    for (name <- Seq("q55_grouping_sets", "q3_sort", "q56_sample");
         rep <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
