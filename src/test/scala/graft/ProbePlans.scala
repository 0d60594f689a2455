package graft

/** Plan-inspection probe (the Probe* convention): dump exchange count,
  * scan pruning lines and join/window operators for named registry
  * queries — the quick `.explain` audit loop without spinning up a
  * ScalaTest run. Usage:
  * `tools/runjava.sh graft.ProbePlans <sfDir> q123_source_quota,q124_bm25`
  */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(8)
    for (q <- names) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(p).length
      println(s"=== $q exchanges=$ex")
      p.linesIterator
        .filter(l => l.contains("ReadSchema") || l.contains("PushedFilters"))
        .foreach(l => println("  scan: " + l.trim.take(160)))
      p.linesIterator
        .filter(l => l.contains("BroadcastNestedLoop") ||
          l.contains("Cartesian") || l.contains("SortMergeJoin") ||
          l.contains("BroadcastHashJoin") || l.contains("Window"))
        .foreach(l => println("  op:   " + l.trim.take(120)))
    }
    spark.stop()
  }
}
