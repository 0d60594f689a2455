package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for q16 (jaccardPairsPrefix) at a given SF dir: where
  * do the seconds go when the slice is constant but the corpus grows
  * 10x? Run: tools/runjava.sh graft.ProbeQ16Sf10 <sfDir>. */
object ProbeQ16Sf10 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "data/sf10"
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.graft.scan.minPartitions", 32)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val df = io.Tables.documents(spark, dir).filter(col("doc_id") < 50000)
    time("scan+filter count")(df.count())
    // replicate jaccardPairsPrefix phase by phase
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
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("sorted"))
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
    val verify = cand.join(broadcast(setsA), Seq("id_a"))
      .join(broadcast(setsB), Seq("id_b"))
      .withColumn("inter",
        size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
    val out = time("verify join")(verify.count())
    println("  pairs: " + out)
    println("=== executed verify plan ===")
    println(verify.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
