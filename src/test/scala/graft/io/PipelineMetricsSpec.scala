package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("observe collects counters from the same job as the action") {
    val df = Seq(
      (1L, "hello world"),
      (2L, ""),
      (3L, null.asInstanceOf[String]),
      (4L, "abc")
    ).toDF("doc_id", "text")
    val (observedDf, obs) = PipelineMetrics.observed(df, "ingest",
      PipelineMetrics.docCounters(col("doc_id"), col("text")))
    // ONE action drives both the "write" and the metrics
    val out = java.nio.file.Files.createTempDirectory("obs").toString
    observedDf.write.mode("overwrite").parquet(out)
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("n_empty") === 2L)
    assert(m("total_chars") === 14L) // 11 + 0 + 3 (null contributes 0)
    assert(m("avg_chars") === 14.0 / 3) // avg ignores the null
    assert(m("approx_ids") === 4L)
  }

  test("GraftSession.local: tuned sibling session, host session untouched") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val s = graft.GraftSession.local(7) // JVM session exists -> newSession
    assert(s ne spark)
    assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(s.conf.get("spark.sql.shuffle.partitions") === "7")
    // the suite's session keeps ITS confs — no cross-session mutation
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
    val r = s.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .first().getDouble(0)
    assert(r === 11.0)
  }

  test("execution log captures completed actions session-wide") {
    val log = PipelineMetrics.attachExecutionLog(spark)
    try {
      val before = log.entries.size
      Seq((1L, "x"), (2L, "y")).toDF("id", "t").count()
      // listener delivery is async; the bus flushes within a few seconds
      var tries = 0
      while (log.entries.size == before && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val fresh = log.entries.drop(before)
      assert(fresh.nonEmpty, "no execution captured")
      assert(fresh.exists(_.funcName == "count"))
      assert(fresh.forall(_.durationNs > 0))
    } finally spark.listenerManager.unregister(log)
  }

  test("observed metrics match a direct aggregation on real documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (observedDf, obs) = PipelineMetrics.observed(docs, "docs",
      PipelineMetrics.docCounters(col("doc_id"), col("text")))
    val nRows = observedDf.count()
    val m = obs.get
    assert(m("n_rows") === nRows)
    val direct = docs.agg(
      sum(coalesce(length(col("text")), lit(0))).as("total_chars")).first().getLong(0)
    assert(m("total_chars") === direct)
  }
}
