package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rankTopK keeps the top-k by order with deterministic ranks") {
    val df = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7))
      .toDF("id", "score")
    val top = Retrieval.rankTopK(df, Seq($"score".desc, $"id".asc), 3)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    // 0.9-tie broken by id: 2 before 3
    assert(top === Map(2L -> 1, 3L -> 2, 5L -> 3))
  }

  test("rrfFuse: hand-computed fusion, absent side contributes zero") {
    // ranking A: docs 10,11,12 at ranks 1,2,3; B: 11,12,13 at 1,2,3
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((11L, 1), (12L, 2), (13L, 3)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), Nil, Seq("id"), kRrf = 60, topK = 10)
      .collect().map(r => (r.getLong(0),
        (Option(r.get(1)), Option(r.get(2)), r.getDouble(3), r.getInt(4))))
      .toMap
    def rrf(ranks: Seq[Int]) =
      math.floor(ranks.map(r => 1.0 / (60.0 + r)).sum * 1e6 + 0.5) / 1e6
    // doc 11 (2,1) and doc 12 (3,2) beat doc 10 (1, absent): two
    // mid-ranks outweigh one first place — the calibration-free
    // consensus property RRF is used for
    assert(out(11L)._4 === 1)
    assert(out(12L)._4 === 2)
    assert(out(10L)._4 === 3)
    assert(out(13L)._4 === 4)
    assert(out(11L)._3 === rrf(Seq(2, 1)))
    assert(out(10L)._3 === rrf(Seq(1)))
    assert(out(10L)._2 === None) // absent from B
    assert(out(13L)._1 === None) // absent from A
  }

  test("rrfFuse ties break by id ascending") {
    // symmetric ranks (1,2) vs (2,1) give identical rrf: id decides
    val a = Seq((7L, 1), (5L, 2)).toDF("id", "rank")
    val b = Seq((7L, 2), (5L, 1)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), Nil, Seq("id"), topK = 2)
      .orderBy($"fused_rank")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(5L, 7L))
  }

  test("rankingMetrics: hand-computed recall/mrr/ndcg; no-hit query zeroes") {
    val truth = Seq(
      ("a", 1L, 1), ("a", 2L, 2), ("a", 3L, 3), ("a", 4L, 4),
      ("b", 1L, 1), ("b", 2L, 2)
    ).toDF("q", "id", "rank")
    val cand = Seq(
      ("a", 3L, 1), ("a", 9L, 2), ("a", 1L, 3), ("a", 8L, 4), ("a", 7L, 5),
      ("b", 5L, 1), ("b", 6L, 2)
    ).toDF("q", "id", "rank")
    val m = Retrieval.rankingMetrics(truth, cand, Seq("q"), k = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    def log2(x: Double) = math.log(x) / math.log(2.0)
    def snap6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // query a: hits 3@1 and 1@3 -> dcg = 1/log2(2) + 1/log2(4);
    // idcg over min(5, 4) ideal positions
    val dcg = 1.0 / log2(2.0) + 1.0 / log2(4.0)
    val idcg = (1 to 4).map(i => 1.0 / log2(i + 1.0)).sum
    assert(m("a") === ((4L, 2L, snap6(2.0 / 4.0), snap6(1.0), snap6(dcg / idcg))))
    assert(m("b") === ((2L, 0L, 0.0, 0.0, 0.0)))
  }

  test("rrfFuse partitions fused ranks per query") {
    val a = Seq(("q1", 10L, 1), ("q2", 20L, 1)).toDF("q", "id", "rank")
    val b = Seq(("q1", 10L, 3), ("q2", 21L, 1)).toDF("q", "id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), Seq("q"), Seq("id"), topK = 5)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getInt(5))).toMap
    assert(out(("q1", 10L)) === 1)
    assert(out(("q2", 20L)) === 1) // 1/61 + 0 < 1/61+1/61? no: 20 has A-rank 1 only
    assert(out.keySet === Set(("q1", 10L), ("q2", 20L), ("q2", 21L)))
    // within q2: 21 appears only in B at rank 1, 20 only in A at rank 1
    // -> equal rrf, id tiebreak puts 20 first
    assert(out(("q2", 21L)) === 2)
  }
}
