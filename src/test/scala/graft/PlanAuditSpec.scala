package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-quality regression tests: the properties that make queries
  * survive a 100 TB scale-up, asserted on the physical plan so a
  * refactor can't silently lose them. (ExplainAudit is the interactive
  * twin; these are the load-bearing invariants pinned in CI.)
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def exchanges(p: String): Int = p.split("Exchange").length - 1

  test("q1: the date filter reaches the parquet scan; schema is pruned") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "filter must push into the scan")
    assert("ReadSchema: [^\n]+".r.findFirstIn(p).exists(!_.contains("l_comment")),
      "unused columns must not be read")
  }

  test("q2 (compiled filter): all predicates pushed, zero exchanges") {
    val p = plan("q2_filter")
    assert(p.contains("PushedFilters:"))
    Seq("GreaterThan(l_quantity", "LessThanOrEqual(l_discount", "Not(EqualTo(l_returnflag")
      .foreach(f => assert(p.contains(f), s"expected pushed filter $f"))
    assert(exchanges(p) === 0, "a pure filter+project must not shuffle")
  }

  test("q26: dimension joins broadcast; region filter pushes into its scan") {
    val p = plan("q26_join_revenue")
    assert(p.split("BroadcastHashJoin").length - 1 >= 2,
      "nation and region must join as broadcasts")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      "the region filter must reach the region scan")
  }

  test("q56 (hash sample): map-side filter, single aggregation shuffle") {
    val p = plan("q56_sample")
    assert(exchanges(p) <= 2, // partial->final agg (+AQE counts nothing)
      s"hash sampling must stay map-side, got plan:\n$p")
  }

  test("q57 (text cleaning): pure projection, zero exchanges") {
    val p = plan("q57_clean")
    assert(exchanges(p) === 0, "cleaning is a map-side projection")
  }

  test("q22/q23/q25 (token counts, quality, fingerprints): no shuffle") {
    Seq("q22_token_counts", "q23_quality", "q25_fingerprint").foreach { q =>
      assert(exchanges(plan(q)) === 0, s"$q must be map-side only")
    }
  }

  test("q59 (train/test split) groups once: split is not a join") {
    val p = plan("q59_train_test")
    assert(!p.contains("Join"), "split must be a column, not a join")
    assert(exchanges(p) <= 2)
  }
}
