package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: hand-checked Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (7L, 0L))
      .toDF("x", "y")
    val got = df.withColumn("z", Layout.zValue($"x", $"y", bits = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference interleave: x bits at even positions, y at odd
    def morton(x: Long, y: Long): Long =
      (0 until 4).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum
    got.keys.foreach { case (x, y) => assert(got((x, y)) === morton(x, y)) }
    assert(got((1L, 0L)) === 1L)
    assert(got((0L, 1L)) === 2L)
    assert(got((1L, 1L)) === 3L)
  }

  test("z-buckets bound BOTH dimension ranges (the rectangle bound)") {
    // 4096 points on a 64x64 grid, bits=6, bucketShift=6: each bucket
    // is 2^6 consecutive z-values = an 8x8 rectangle — x and y ranges
    // inside any bucket are < 2^ceil(6/2) = 8
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val ext = Layout.zOrderBuckets(pts, "x", "y", bits = 6, bucketShift = 6)
      .groupBy("zbucket")
      .agg((max($"x") - min($"x")).as("xr"), (max($"y") - min($"y")).as("yr"),
        count(lit(1)).as("n"))
      .collect()
    assert(ext.length === 64) // 4096 points / 64 per bucket
    ext.foreach { r =>
      assert(r.getLong(1) < 8 && r.getLong(2) < 8,
        s"bucket ${r.getLong(0)} spans ${r.getLong(1)}x${r.getLong(2)}")
      assert(r.getLong(3) === 64L)
    }
    // contrast: single-column sort buckets of the same size bound x
    // but leave y unbounded (the reason z-order exists)
    val linear = pts.withColumn("bucket", floor(($"x" * 64 + $"y") / 64))
      .groupBy("bucket").agg((max($"y") - min($"y")).as("yr"))
      .filter($"yr" >= 8).count()
    assert(linear > 0)
  }

  test("pruningAudit: hand-computed bucket reads on a uniform grid") {
    // 64x64 grid, bits=6, bucketShift=6: z-buckets are 8x8 rectangles
    // (64 buckets of 64 rows); xShift=yShift=3: 8 linear files of
    // width 8 spanning ALL of the other dimension (512 rows each).
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val preds = Seq(
      Layout.RangePred(1, 0, 7, 0, 7),    // aligned 8x8 box
      Layout.RangePred(2, 8, 15, 0, 63),  // x-only slab
      Layout.RangePred(3, 0, 63, 0, 63),  // full scan
      Layout.RangePred(4, 4, 11, 4, 11),  // straddles 4 z-rects
      Layout.RangePred(5, 3, 2, 0, 63))   // empty box (xLo > xHi)
    val out = Layout.pruningAudit(pts, "x", "y", bits = 6, bucketShift = 6,
        xShift = 3, yShift = 3, preds)
      .collect()
      .map(r => (r.getAs[Int]("pred_id"), r.getAs[String]("layout")) ->
        ((r.getAs[Long]("buckets_total"), r.getAs[Long]("buckets_read"),
          r.getAs[Long]("rows_read"), r.getAs[Long]("rows_matched"))))
      .toMap
    assert(out.size === 15)
    // box predicate: z-order reads 1/64, either linear layout 1/8
    assert(out((1, "zorder")) === ((64L, 1L, 64L, 64L)))
    assert(out((1, "linear_x")) === ((8L, 1L, 512L, 64L)))
    assert(out((1, "linear_y")) === ((8L, 1L, 512L, 64L)))
    // x-only slab: linear_x perfect, z-order reads its column of
    // rects (8 of 64), linear_y reads everything
    assert(out((2, "linear_x")) === ((8L, 1L, 512L, 512L)))
    assert(out((2, "zorder")) === ((64L, 8L, 512L, 512L)))
    assert(out((2, "linear_y")) === ((8L, 8L, 4096L, 512L)))
    // full range: no layout prunes anything
    assert(out((3, "zorder")) === ((64L, 64L, 4096L, 4096L)))
    assert(out((3, "linear_x")) === ((8L, 8L, 4096L, 4096L)))
    // unaligned 8x8 box straddles 4 z-rects / 2 linear files
    assert(out((4, "zorder")) === ((64L, 4L, 256L, 64L)))
    assert(out((4, "linear_x")) === ((8L, 2L, 1024L, 64L)))
    // empty predicate: min/max stats cannot prove emptiness, so
    // buckets are still read, but the exact answer is 0 rows
    assert(out((5, "zorder"))._4 === 0L)
    assert(out((5, "zorder"))._2 > 0L)
    // snapped read fraction replays the exact-double chain
    val frac = Layout.pruningAudit(pts, "x", "y", 6, 6, 3, 3,
        Seq(Layout.RangePred(1, 0, 7, 0, 7)))
      .filter($"layout" === "zorder").select("read_fraction")
      .collect().head.getDouble(0)
    assert(frac === math.floor(1.0 / 64.0 * 1e6) / 1e6)
    intercept[IllegalArgumentException](
      Layout.pruningAudit(pts, "x", "y", 6, 6, 3, 3, Seq.empty))
    intercept[IllegalArgumentException](
      Layout.pruningAudit(pts, "x", "y", 6, 6, 3, 3,
        Seq(Layout.RangePred(1, 0, 1, 0, 1), Layout.RangePred(1, 2, 3, 2, 3))))
  }

  test("compactionPlan: hand-checked bins, big files skip, null rows throw") {
    val files = Seq(
      ("p1", "a", 100L),   // bin 0 (presum 0)
      ("p1", "b", 2400L),  // bin 0 (presum 100) — bin 0 closes at 2500
      ("p1", "c", 300L),   // bin 1 (presum 2500)
      ("p1", "d", 5000L),  // at/over target: left alone
      ("p2", "a", 10L),    // independent partition restarts at bin 0
      ("p2", "x", 10L)
    ).toDF("part", "file", "size_bytes")
    val out = Layout.compactionPlan(files, "part", "file", "size_bytes", 2500L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3))), r.getBoolean(4)))
      .toMap
    assert(out(("p1", "a")) === ((Some(0L), true)))
    assert(out(("p1", "b")) === ((Some(0L), true)))
    assert(out(("p1", "c")) === ((Some(1L), true)))
    assert(out(("p1", "d")) === ((None, false)))
    assert(out(("p2", "a")) === ((Some(0L), true)))
    assert(out(("p2", "x")) === ((Some(0L), true)))
    // unplannable rows (null size/file) FAIL the plan loudly — a
    // silent drop would return a plausible plan that skips real files
    val withNull = Seq(("p1", "a", Some(10L)), ("p1", null, Some(10L)),
      ("p1", "c", Option.empty[Long])).toDF("part", "file", "size_bytes")
    val ex = intercept[Exception](
      Layout.compactionPlan(withNull, "part", "file", "size_bytes",
        100L).count())
    assert(ex.getMessage.contains("unplannable") ||
      (ex.getCause != null && ex.getCause.getMessage.contains("unplannable")))
    intercept[IllegalArgumentException](
      Layout.compactionPlan(files, "part", "file", "size_bytes", 0L))
    // every closed bin holds >= target (overshoot bounded by one file):
    // duplicate-size files must each contribute once (the ROWS-frame
    // pin — a RANGE frame would give name-order peers one shared cumsum)
    val dup = Seq(("p", "f1", 1000L), ("p", "f2", 1000L), ("p", "f3", 1000L),
      ("p", "f4", 1000L)).toDF("part", "file", "size_bytes")
    val bins = Layout.compactionPlan(dup, "part", "file", "size_bytes", 2000L)
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(bins === Map("f1" -> 0L, "f2" -> 0L, "f3" -> 1L, "f4" -> 1L))
  }

  test("shardManifest: checksum is order/partition independent, counts move on duplication") {
    val docs = Seq((0L, 1L, "alpha"), (0L, 2L, "beta"), (1L, 3L, "gamma"),
      (1L, 4L, "delta"), (1L, 5L, null.asInstanceOf[String]))
      .toDF("shard", "id", "content")
    def m(df: org.apache.spark.sql.DataFrame) =
      Layout.shardManifest(df, "shard", "id", "content")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.get(2), r.get(3), r.getLong(4), r.getLong(5))))
        .toMap
    val base = m(docs)
    assert(base(0L)._1 === 2L && base(1L)._1 === 3L)
    assert(base(1L)._4 === 3L && base(1L)._5 === 5L) // id range incl. null-content row
    // order & partitioning invariance: the release-integrity property
    assert(m(docs.orderBy(org.apache.spark.sql.functions.rand(3))
      .repartition(7)) === base)
    // null content: excluded from the xor, still counted
    val noNull = m(docs.filter($"content".isNotNull))
    assert(noNull(1L)._3 === base(1L)._3, "xor must ignore the null row")
    assert(noNull(1L)._1 === 2L && base(1L)._1 === 3L)
    // a doubled row cancels out of XOR (shard {a,a,b} xors like {b})
    // but moves n_docs — the documented pairing that makes the
    // manifest duplication-honest
    val doubled = m(docs.union(docs.filter($"id" === 1L)))
    val without = m(docs.filter($"id" =!= 1L))
    assert(doubled(0L)._3 === without(0L)._3, "xor is blind to the pair")
    assert(doubled(0L)._1 === 3L && without(0L)._1 === 1L,
      "n_docs must expose the duplication")
  }

  test("zOrderBuckets fails loudly on out-of-range inputs, keeps nulls null") {
    val bad = Seq((Some(70L), Some(1L))).toDF("x", "y")
    val ex = intercept[Exception] {
      Layout.zOrderBuckets(bad, "x", "y", bits = 6, bucketShift = 2).collect()
    }
    assert(ex.getMessage != null)
    val withNull = Seq((Option.empty[Long], Some(1L)), (Some(2L), Some(3L)))
      .toDF("x", "y")
    val rows = Layout.zOrderBuckets(withNull, "x", "y", bits = 6, bucketShift = 2)
      .select("zvalue").collect()
    assert(rows.count(_.isNullAt(0)) === 1)
  }
}
