package graft.ext

import graft.SparkSpec
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.functions._

/** Regression spec for the shared loop-state pin (PinnedLoop) — the
  * structural invariants whose violation caused the round-8 scale
  * bugs (SCALE.md round 8c; ProbeCkptLoop is the manual wall-clock
  * repro). Timing is load-dependent, so the spec pins the MECHANISM:
  *
  *  1. constant plan depth — the pinned frame is always a leaf
  *     (LogicalRDD), never a growing chain whose explain/analysis cost
  *     compounds per round (the chained-cache plan-string driver OOM);
  *  2. bounded RDD lineage — the every-8th-round localCheckpoint caps
  *     dependency depth at ~one checkpoint window, where an unbounded
  *     pin chain grows linearly (the ~25-round task-serialization
  *     stack overflow);
  *  3. correctness across many rounds — values survive the
  *     materialize-before-unpersist handoff and finish() yields a
  *     frame that outlives release().
  */
class PinnedLoopSpec extends SparkSpec {

  private def lineageDepth(r: RDD[_], seen: Set[Int] = Set.empty): Int =
    if (r.dependencies.isEmpty || seen.contains(r.id)) 1
    else 1 + r.dependencies.map(d => lineageDepth(d.rdd, seen + r.id)).max

  test("pinned frame stays a plan leaf at any round depth") {
    val loop = PinnedLoop.start(spark.range(100).toDF("v"))
    try {
      for (_ <- 1 to 12) {
        val out = loop.advance(loop.current.withColumn("v", col("v") + 1))
        // LogicalRDD leaf or (on checkpoint rounds) the lc leaf: either
        // way NO children — a per-round chain would deepen here
        assert(out.queryExecution.analyzed.children.isEmpty,
          s"pinned frame is not a leaf:\n${out.queryExecution.analyzed}")
      }
      assert(loop.current.agg(sum(col("v"))).head.getLong(0) ==
        (0L until 100L).map(_ + 12).sum)
    } finally loop.release()
  }

  test("every-8th checkpoint bounds RDD lineage depth") {
    def run(checkpointEvery: Int, rounds: Int): Int = {
      val loop = PinnedLoop.start(spark.range(50).toDF("v"), checkpointEvery)
      try {
        var maxDepth = 0
        for (_ <- 1 to rounds) {
          // a round with real shuffle lineage (the cc/bpe shape)
          val next = loop.current.groupBy(col("v") % 50).agg(
            (min(col("v")) + 1).as("v")).select("v")
          maxDepth = math.max(maxDepth, lineageDepth(loop.advance(next).rdd))
        }
        maxDepth
      } finally loop.release()
    }
    val bounded = run(checkpointEvery = 8, rounds = 20)
    val unbounded = run(checkpointEvery = 1000, rounds = 20)
    // persist alone does NOT truncate lineage: the unbounded variant
    // must grow well past the checkpointed one, and the checkpointed
    // one must stay within ~one 8-round window of levels
    assert(unbounded > bounded + 10,
      s"expected unbounded ($unbounded) >> bounded ($bounded)")
    assert(bounded < 80, s"bounded lineage depth too deep: $bounded")
  }

  test("finish() survives release and returns the transformed state") {
    val loop = PinnedLoop.start(spark.range(10).toDF("v"))
    loop.advance(loop.current.withColumn("w", col("v") * 2))
    val out = loop.finish(_.select("w"))
    // pin released; the finished frame must still evaluate correctly
    assert(out.agg(sum(col("w"))).head.getLong(0) == 90L)
    loop.release() // idempotent
  }
}
