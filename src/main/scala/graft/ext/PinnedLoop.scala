package graft.ext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Loop-state pin for iterative DataFrame algorithms — ONE
  * implementation of the pattern [[Dedup.connectedComponents]] and the
  * BPE trainer ([[TextAnalysis]]) both depend on, because its failure
  * modes are silent and multiplicative (SCALE.md round 8c; the
  * PinnedLoopSpec regression pins the flat-per-round invariant):
  *
  *  - a per-round `localCheckpoint` CHAIN re-executes its own history
  *    once deeper than ~17 links — measured 1.2 s/round flat through
  *    round 17, then 2.1/3.4/7.8/20/49/143 s on a constant-size ring
  *    graph (Spark 4.1.2);
  *  - a per-round `cache()` chain avoids recompute but grows a plan
  *    whose STRING rendering (explain / UI) embeds every
  *    InMemoryRelation's child — the driver OOMs on the plan text near
  *    ~20 rounds before any data moves;
  *  - a bare `persist` round-trip stays flat BUT RDD lineage still
  *    deepens ~10 narrow levels per round, and task (de)serialization
  *    recursion stack-overflows near round ~25.
  *
  * The pattern that holds at any depth: each round round-trips the
  * state through a persisted RDD (`createDataFrame(rdd, schema)` is a
  * LogicalRDD LEAF — constant plan depth), materializes the new pin
  * BEFORE dropping the previous round's blocks, and takes a REAL
  * `localCheckpoint` every `checkpointEvery`-th round to bound the
  * RDD-lineage depth (the lc chain this builds is ≤ rounds/8 links,
  * far below the ~17-link re-execution cliff).
  *
  * Not concurrency-safe: one loop instance per algorithm invocation.
  * Always call [[release]] (or [[finish]]) in a `finally` — an
  * abandoned pin leaks executor storage for the life of the session.
  */
final class PinnedLoop private (private val spark: SparkSession,
                                checkpointEvery: Int) {
  require(checkpointEvery >= 1, "checkpointEvery must be >= 1")

  private var frame: DataFrame = _
  private var pinned: RDD[Row] = null
  private var rounds = 0

  /** The current pinned state (valid between [[advance]] calls). */
  def current: DataFrame = frame

  /** Pin `next` as the new loop state and return it: persist its RDD,
    * materialize NOW (while the previous round's blocks still back the
    * lineage), then drop the previous pin. Every `checkpointEvery`-th
    * round the fresh pin is additionally localCheckpoint'ed (reads the
    * just-materialized blocks — one scan of the state table) so task
    * serialization never recurses an unbounded lineage.
    */
  def advance(next: DataFrame): DataFrame = {
    val r = next.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val out = spark.createDataFrame(r, next.schema)
    out.count() // materialize now, while parents are still persisted
    if (pinned != null) pinned.unpersist(blocking = false)
    pinned = r
    rounds += 1
    if (rounds % checkpointEvery == 0) {
      frame = out.localCheckpoint() // eager: completes before the unpin
      pinned.unpersist(blocking = false)
      pinned = null
    } else frame = out
    frame
  }

  /** Finish the loop: `f(current)` gets ONE final localCheckpoint so
    * the result owns its blocks (later eviction can never cascade a
    * recompute through the loop's dropped RDDs), then the pin is
    * released. */
  def finish(f: DataFrame => DataFrame = identity): DataFrame = {
    val out = f(frame).localCheckpoint()
    release()
    out
  }

  /** Drop the current pin (idempotent). Call from `finally` so a
    * mid-loop failure — including a fail-loud non-convergence throw —
    * cannot leak persisted blocks. */
  def release(): Unit =
    if (pinned != null) {
      pinned.unpersist(blocking = false)
      pinned = null
    }
}

object PinnedLoop {
  /** Start a loop with `first` as the initial pinned state (counts as
    * round 0 — the checkpoint cadence starts at the first advance). */
  def start(first: DataFrame, checkpointEvery: Int = 8): PinnedLoop = {
    val loop = new PinnedLoop(first.sparkSession, checkpointEvery)
    val r = first.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val out = loop.spark.createDataFrame(r, first.schema)
    out.count()
    loop.pinned = r
    loop.frame = out
    loop
  }
}
