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
