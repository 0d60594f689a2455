package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Minimal reproduction of the iterative-localCheckpoint blowup seen in
  * connectedComponents at sf10: constant-size data, constant plan, yet
  * per-iteration wall time doubles after ~15 rounds. Variants:
  *   lc    — Dataset.localCheckpoint() per iteration (the pathology)
  *   rdd   — the shared [[graft.ext.PinnedLoop]] pin (flat at any
  *           depth; its structural invariants are pinned by
  *           PinnedLoopSpec — this probe remains the manual wall-clock
  *           demonstration of the cliff the utility exists to avoid)
  */
object ProbeCkptLoop {
  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("lc")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(25)
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ring graph: 150k nodes, each connected to its successor — the
    // worst case for min-label propagation (single long cycle)
    val n = 150000L
    val edges0 = spark.range(n).select(col("id").as("src"),
      ((col("id") + 1) % n).as("dst"))
    val edges = edges0.union(edges0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    var labels: DataFrame = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    val loop = if (variant == "rdd") graft.ext.PinnedLoop.start(labels) else null

    for (it <- 1 to iters) {
      val t0 = System.nanoTime()
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("__nmin"))
      val hop = labels.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("component"), coalesce(col("__nmin"), col("component")))
            .as("component"))
      val joined = hop.as("x")
        .join(hop.as("y"), col("x.component") === col("y.id"))
        .select(col("x.id").as("id"), col("y.component").as("component"))
      labels = variant match {
        case "lc" => joined.localCheckpoint()
        case "rdd" => loop.advance(joined)
      }
      println(f"[ckptloop] $variant iter $it  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    if (loop != null) loop.release()
    spark.stop()
  }
}
