package graft.ext

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Per-stage wall/task-time breakdown for one registered query — the
  * "where does the time actually go" probe the optimization guide's
  * empirical loop needs (no Spark UI in this sandbox). Runs the query
  * `reps` times (JIT warm-up; the LAST run's stages are reported).
  * Throwaway test-scope tooling.
  *
  * Run: tools/runjava.sh graft.ext.StageTimeMain <sfDir> <query> [reps]
  */
object StageTimeMain {
  private final case class St(id: Int, name: String, wallMs: Long,
                              taskMs: Long, tasks: Int,
                              shufReadB: Long, shufWriteB: Long)

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qname = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.graft.scan.minPartitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = ArrayBuffer.empty[St]
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val acc = taskMs.computeIfAbsent(e.stageId, _ => Array(0L, 0L, 0L, 0L))
          acc.synchronized {
            acc(0) += m.executorRunTime
            acc(1) += 1
            acc(2) += m.shuffleReadMetrics.totalBytesRead
            acc(3) += m.shuffleWriteMetrics.bytesWritten
          }
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        val acc = taskMs.getOrDefault(i.stageId, Array(0L, 0L, 0L, 0L))
        stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(90), wall,
          acc(0), acc(1).toInt, acc(2), acc(3))
      }
    })

    val fn = graft.SparkEntry.queries(qname)
    var lastWall = 0.0
    (1 to reps).foreach { r =>
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      if (r == reps) { stages.clear(); taskMs.clear() }
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      lastWall = (System.nanoTime() - t0) / 1e9
      println(f"run $r: $lastWall%.3f s")
    }
    Thread.sleep(400) // listener bus drain
    println(f"== $qname last-run wall: $lastWall%.3f s; stages (submission order):")
    val totW = stages.map(s => math.max(s.wallMs, 0)).sum
    stages.sortBy(_.id).foreach { s =>
      println(f"  stage ${s.id}%4d wall ${s.wallMs}%6d ms  task ${s.taskMs}%7d ms " +
        f"n=${s.tasks}%3d  sr=${s.shufReadB / 1024}%8d KB sw=${s.shufWriteB / 1024}%8d KB  ${s.name}")
    }
    println(f"  total stage wall: $totW ms (gaps to ${lastWall * 1000}%.0f ms = driver/plan time)")
    spark.stop()
  }
}
