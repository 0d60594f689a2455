package graft.ext


import graft.SparkSpec
import org.apache.spark.sql.functions.{levenshtein, lower, substring}

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join") {
    // skewed: 90% of the big side carries key 1
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, i.toDouble))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (0L, "f")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Joins.saltedJoin(big, small, "k", salt = 8)
    assert(salted.count() === plain.count())
    val a = plain.groupBy("k", "name").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val b = salted.groupBy("k", "name").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("salted join spreads a hot key across reducers") {
    val big = (1 to 2000).map(i => (1L, i.toDouble)).toDF("k", "v")
    val small = Seq((1L, "only")).toDF("k", "name")
    // hot key 1 appears with 8 distinct salt values -> 8 shuffle keys
    val saltKeys = big.withColumn("__salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.struct($"k", $"v")),
          org.apache.spark.sql.functions.lit(8)))
      .select("__salt").distinct().count()
    assert(saltKeys === 8)
    assert(Joins.saltedJoin(big, small, "k", 8).count() === 2000)
  }

  test("asof join picks the latest right row at or before each left row") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val quotes = Seq(
      (1L, ts("2024-01-01 00:00:10"), 100.0),
      (1L, ts("2024-01-01 00:00:20"), 101.0),
      (2L, ts("2024-01-01 00:00:15"), 50.0)
    ).toDF("k", "ts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 00:00:05"), "early"),  // before any quote -> null
      (1L, ts("2024-01-01 00:00:10"), "tie"),    // == quote ts -> included
      (1L, ts("2024-01-01 00:00:25"), "late"),   // latest quote 101
      (2L, ts("2024-01-01 00:00:30"), "other"),  // other key -> 50
      (3L, ts("2024-01-01 00:00:30"), "nokey")   // no right rows -> null
    ).toDF("k", "ts", "tag")
    val out = Joins.asofJoin(trades, quotes, "k", "ts", "ts")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("px_r")).map(_.toDouble)).toMap
    assert(out === Map(
      "early" -> None, "tie" -> Some(100.0), "late" -> Some(101.0),
      "other" -> Some(50.0), "nokey" -> None))
  }

  test("asof join keeps the matched row's genuine NULLs (no cross-row stitching)") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val quotes = Seq(
      (1L, ts("2024-01-01 00:00:10"), Some(100.0)),
      (1L, ts("2024-01-01 00:00:20"), None) // matched row has NULL px
    ).toDF("k", "ts", "px")
    val trades = Seq((1L, ts("2024-01-01 00:00:25"), "t")).toDF("k", "ts", "tag")
    val r = Joins.asofJoin(trades, quotes, "k", "ts", "ts").collect().head
    // the latest quote (00:00:20) matches; its px is genuinely NULL and
    // must NOT be backfilled from the older quote's 100.0
    assert(r.getAs[java.sql.Timestamp]("ts_r") === ts("2024-01-01 00:00:20"))
    assert(r.getAs[Any]("px_r") === null)
  }

  test("binned range join equals the naive non-equi join") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val points = Seq(
      (1L, ts("2024-01-01 00:30:00")), (2L, ts("2024-01-01 01:30:00")),
      (3L, ts("2024-01-01 02:00:00")), (4L, ts("2024-01-01 05:59:59")),
      (5L, ts("2024-01-01 07:00:00"))
    ).toDF("pid", "t")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      (11L, ts("2024-01-01 01:00:00"), ts("2024-01-01 06:00:00")) // overlapping
    ).toDF("iid", "lo", "hi")
    val naive = points.join(intervals, $"t" >= $"lo" && $"t" < $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = Joins.rangeJoinBinned(points, intervals, "t", "lo", "hi", 1800)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === naive)
    assert(naive === Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L)))
  }

  test("binned range join accepts TIMESTAMP_NTZ columns (the TZ-less parquet type)") {
    // plain timestamp[us] parquet reads as TIMESTAMP_NTZ under Spark 4's
    // default inference; a raw cast-to-long binning is an analysis error
    // on that type (the q48 round-6 regression) — the join must work on
    // NTZ inputs directly, without the caller pre-normalizing
    import org.apache.spark.sql.functions.{col, to_timestamp_ntz}
    def ntz(c: String) = to_timestamp_ntz(col(c))
    val points = Seq((1L, "2024-01-01 00:30:00"), (2L, "2024-01-01 01:30:00"),
        (3L, "2024-01-01 07:00:00"))
      .toDF("pid", "raw").select(col("pid"), ntz("raw").as("t"))
    val intervals = Seq((10L, "2024-01-01 00:00:00", "2024-01-01 02:00:00"))
      .toDF("iid", "rawlo", "rawhi")
      .select(col("iid"), ntz("rawlo").as("lo"), ntz("rawhi").as("hi"))
    assert(points.schema("t").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    val got = Joins.rangeJoinBinned(points, intervals, "t", "lo", "hi", 1800)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 10L)))
  }

  test("binned range join keeps matches when hi carries sub-second precision") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // unix_timestamp floors to whole seconds; binning (hi - 1) dropped
    // the top bin whenever hi was fractional, losing any point in hi's
    // second (point 00:30:00.2 < hi 00:30:00.5 is a genuine match)
    val points = Seq(
      (1L, ts("2024-01-01 00:30:00.2")),  // same second as hi, before it
      (2L, ts("2024-01-01 00:30:00.7")),  // same second, at/after hi -> out
      (3L, ts("2024-01-01 00:10:00.0"))   // interior match
    ).toDF("pid", "t")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00.0"), ts("2024-01-01 00:30:00.5"))
    ).toDF("iid", "lo", "hi")
    val naive = points.join(intervals, $"t" >= $"lo" && $"t" < $"hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = Joins.rangeJoinBinned(points, intervals, "t", "lo", "hi", 1800)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive === Set((1L, 10L), (3L, 10L)))
    assert(binned === naive)
  }

  test("bucketed tables join without a shuffle (co-located)") {
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lines")
    val orders = (1L to 200L).map(k => (k, s"p${k % 5}")).toDF("okey", "prio")
    val lines = (1L to 1000L).map(i => (i % 200 + 1, i.toDouble)).toDF("okey", "qty")
    orders.write.bucketBy(4, "okey").sortBy("okey").saveAsTable("bkt_orders")
    lines.write.bucketBy(4, "okey").sortBy("okey").saveAsTable("bkt_lines")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bkt_lines").join(spark.table("bkt_orders"), "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("fuzzy join recovers planted tail edits at distance <= 1") {
    val canon = Seq("blue widget", "red gizmo", "green fixture")
      .toDF("name")
    val dirty = Seq(
      (1L, "blue widge"),    // last char dropped
      (2L, "red gizmos"),    // char appended
      (3L, "green fixtura"), // last char substituted
      (4L, "blue widget"),   // exact (distance 0)
      (5L, "purple cog")     // no canonical within 1
    ).toDF("rid", "dirty")
    val got = Joins.fuzzyJoinEditDistance(dirty, canon, "dirty", "name",
        maxDist = 1, prefixLen = 4)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3))).toSet
    assert(got === Set(
      (1L, "blue widget", 1), (2L, "red gizmo", 1),
      (3L, "green fixture", 1), (4L, "blue widget", 0)))
  }

  test("fuzzy join equals the unblocked reference when edits avoid the prefix") {
    // random-ish strings with a stable 4-char prefix, edits at the tail
    val names = (0 until 40).map(i => s"name${i}xx${('a' + i % 7).toChar}")
    val left = names.zipWithIndex
      .map { case (n, i) => (i.toLong, if (i % 2 == 0) n.dropRight(1) else n) }
      .toDF("rid", "s")
    val right = names.toDF("t")
    val blocked = Joins.fuzzyJoinEditDistance(left, right, "s", "t",
        maxDist = 1, prefixLen = 4)
      .select("rid", "t").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val reference = left.crossJoin(right)
      .filter(levenshtein($"s", $"t") <= 1)
      .filter(lower(substring($"s", 1, 4)) === lower(substring($"t", 1, 4)))
      .select("rid", "t").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(blocked === reference)
    assert(blocked.size >= 40) // every row matches at least its source name
  }

  test("fuzzy join recall contract: an edit inside the prefix is missed") {
    val canon = Seq("blue widget").toDF("name")
    val dirty = Seq((1L, "flue widget")).toDF("rid", "dirty") // edit at char 1
    val got = Joins.fuzzyJoinEditDistance(dirty, canon, "dirty", "name",
      maxDist = 1, prefixLen = 4)
    assert(got.count() === 0) // distance 1, but outside the block — documented
  }

  test("fuzzy join: null keys never match; maxDist=0 is exact equality") {
    val canon = Seq(Some("alpha"), None).toDF("name")
    val dirty = Seq((1L, Some("alpha")), (2L, None)).toDF("rid", "dirty")
    val d1 = Joins.fuzzyJoinEditDistance(dirty, canon, "dirty", "name", 1)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(d1 === Set((1L, "alpha")))
    val d0 = Joins.fuzzyJoinEditDistance(dirty, canon, "dirty", "name", 0)
      .collect().map(r => (r.getLong(0), r.getInt(3))).toSet
    assert(d0 === Set((1L, 0)))
  }
}
