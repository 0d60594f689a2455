package graft.ext

import graft.SparkSpec

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)],
                      maxDriverEdges: Long = 2000000L,
                      iters: Int = 10): Map[Long, (Long, Long, Double)] =
    Graphs.pageRankFixedPoint(
        edges.toDF("src", "dst"), "src", "dst", iters = iters,
        maxDriverEdges = maxDriverEdges)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("pageRank: a sink fed by everyone outranks its feeders; mass is conserved up to floor leak") {
    // star: 1..5 -> 0, plus 0 -> 1 so node 0 is not dangling
    val edges = (1L to 5L).map(i => (i, 0L)) :+ ((0L, 1L))
    val out = ranksOf(edges)
    assert(out.size === 6)
    assert(out(0L)._1 === 1L) // out_degree: the 0 -> 1 edge
    val r0 = out(0L)._2
    (2L to 5L).foreach(i => assert(r0 > out(i)._2, s"node $i"))
    // node 1 receives all of 0's damped mass, so it outranks 2..5 too
    assert(out(1L)._2 > out(2L)._2)
    val total = out.values.map(_._2).sum
    // total mass scale=1e12, floor leak bounded by (terms per round)
    // x rounds; with 6 nodes and 6 edges that is < 200 units
    assert(total <= 1000000000000L && total > 1000000000000L - 10000L)
  }

  test("pageRank: dangling mass is redistributed, not lost") {
    // 1 -> 2, 2 has no out-edges (dangling); without redistribution
    // node 1 would keep only the teleport base
    val out = ranksOf(Seq((1L, 2L)))
    assert(out(2L)._1 === 0L)
    assert(out(1L)._2 > 0L && out(2L)._2 > out(1L)._2)
    val total = out.values.map(_._2).sum
    assert(total > 1000000000000L - 1000L)
  }

  test("pageRank: driver path and distributed loop are BIT-identical") {
    // a 40-node graph with cycles, a hub, dangling nodes, a self-loop,
    // and duplicate edges (which must dedupe identically on both paths)
    val edges = (0L until 40L).flatMap { i =>
      Seq((i, (i * i + 7) % 37), (i, (3 * i + 1) % 41 % 40)) ++
        (if (i % 11 == 3) Seq((i, i)) else Nil) ++
        (if (i % 7 == 2) Seq((i, (i * i + 7) % 37)) else Nil) // dup
    }.filter(_._1 % 13 != 0) // silenced sources -> dangling nodes
    val driver = ranksOf(edges, maxDriverEdges = 2000000L)
    val dist = ranksOf(edges, maxDriverEdges = 0L)
    assert(driver === dist)
    assert(driver.nonEmpty)
  }

  test("pageRank: null endpoints drop identically on both paths; empty graph throws") {
    val e = Seq((Some(1L), Some(2L)), (Some(2L), None), (None, Some(3L)),
      (Some(2L), Some(1L))).toDF("src", "dst")
    val a = Graphs.pageRankFixedPoint(e, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = Graphs.pageRankFixedPoint(e, "src", "dst", iters = 3,
        maxDriverEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a === b)
    assert(a.map(_._1) === Set(1L, 2L)) // 3 has no non-null edge
    intercept[IllegalArgumentException] {
      Graphs.pageRankFixedPoint(
        Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
    }
  }

  test("pageRank: fixed-iteration semantics — one round from uniform is the exact recurrence") {
    // 2-cycle plus dangling: 1 -> 2, 2 -> 1, 2 -> 3. By hand at
    // scale = 1e12, N = 3, pr0 = 333333333333 each:
    //   dangling D = pr0(3); base = 3e12/60 = 50000000000
    //   dshare = 17*D/60 = 94444444444 (floor)
    //   inc(2) = 17*pr0/20 = 283333333333 (floor)
    //   inc(1) = inc(3) = 17*pr0/40 = 141666666666 (floor)
    val out = ranksOf(Seq((1L, 2L), (2L, 1L), (2L, 3L)), iters = 1)
    val base = 50000000000L
    val dshare = 17L * 333333333333L / 60L
    assert(out(2L)._2 === base + dshare + 17L * 333333333333L / 20L)
    assert(out(1L)._2 === base + dshare + 17L * 333333333333L / 40L)
    assert(out(3L)._2 === out(1L)._2)
  }
}
