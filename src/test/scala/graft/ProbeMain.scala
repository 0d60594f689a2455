package graft

import org.apache.spark.sql.SparkSession
import graft.model._
import graft.model.ColumnOperation._
import graft.query.QueryCompiler

/** Scratch driver for manual end-to-end probes through the public API
  * (test scope; run with `sbt "Test/runMain graft.ProbeMain"`). */
object ProbeMain {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    try {
      QueryCompiler.compile(df, StructuredQuery(QueryIntent.Filter,
        operations = Seq(Filter("l_quantity", CompareOp.Gt, "not_a_number")))).count()
      println("PROBE: no error (predicate silently dropped?)")
    } catch {
      case e: Throwable =>
        println("PROBE: failed loudly: " + e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage).take(150))
    }
    s.stop()
  }
}
