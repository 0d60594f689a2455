package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe (test scope) for the decontamination pass:
  * stage-level timings at bench settings. Run:
  * java -cp target/scala-2.13/classes:target/scala-2.13/test-classes:... graft.ProbeQ86 [sfDir]
  */
object ProbeQ86 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.graft.scan.minPartitions",
          sys.env.getOrElse("PROBE_MIN_PARTS", "32"))
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    io.Tables.lineitem(spark, dir).count()
    def run(label: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
    val docs = io.Tables.documents(spark, dir)
    run("q86 contaminationStats") {
      ext.Dedup.contaminationStats(
        docs.filter(col("doc_id") >= 100), docs.filter(col("doc_id") < 100),
        "doc_id", "text", ngram = 5, minOverlap = 1L).count()
    }
    run("corpus shingles only") {
      ext.Dedup.shinglesDF(
        docs.filter(col("doc_id") >= 100), "doc_id", "text", 5)
        .filter(length(col("shingle")) > 0)
        .select(col("id"), md5(col("shingle")).as("d")).count()
    }
    spark.stop()
  }
}
