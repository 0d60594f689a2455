package graft

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, io => gio}

/** Ad-hoc stage-timing probe for q121's SemDeDup pipeline (scale work:
  * attributes wall time to train / score / pair / component stages so
  * optimization effort lands on the real cost, not a guess). */
object ProbeSemDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/data/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.graft.scan.minPartitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = gio.Tables.embeddings(spark, dir)
    val n = timed("count")(emb.count())
    val k = graft.ext.Similarity.adaptiveCells(n)
    println(s"[probe] n=$n cells=$k")
    val ctrs = timed("trainIvfCentroids")(
      graft.ext.Similarity.trainIvfCentroids(
        emb, "vec_id", "embedding", nCells = k,
        trainFraction = 0.25, seed = 42L, dim = 64))
    val tau = 0.45
    val scored = timed("scored eager ckpt")(
      graft.ext.Dedup.semDedupScored(emb, "vec_id", "embedding", ctrs)
        .localCheckpoint(eager = true))
    val pairs = graft.ext.Dedup.semDedupPairs(scored, tau, None)
    timed("pairs count")(pairs.count())
    var lastRound = System.nanoTime()
    val comp = timed("connectedComponents")(
      graft.ext.Dedup.connectedComponents(pairs, onRound = it => {
        val now = System.nanoTime()
        println(f"[probe] cc round $it  ${(now - lastRound) / 1e9}%7.2f s")
        lastRound = now
      }))
    timed("comp count")(comp.count())
    timed("full semDedupWith")(
      graft.ext.Dedup.semDedupWith(emb, "vec_id", "embedding", ctrs, tau).count())
    spark.stop()
  }
}
