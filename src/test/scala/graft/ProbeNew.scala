package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (test scope): plan + timing check for newly-registered
  * queries at bench settings. */
object ProbeNew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.graft.scan.minPartitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    io.Tables.lineitem(spark, dir).count()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      println(s"=== $n plan ===")
      println(fn(spark, dir).queryExecution.executedPlan.toString.take(2500))
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val c = fn(spark, dir).count()
        println(f"[probe] $n run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$c)")
      }
    }
    spark.stop()
  }
}
