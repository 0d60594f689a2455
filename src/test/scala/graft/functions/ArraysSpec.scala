package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The round-14 codegen array primitives that replaced interpreted
  * higher-order-function formulations on the dedup verify hot paths:
  * each is pinned EQUAL to the HOF expression it replaced, on the same
  * shapes the operators feed it (plus adversarial ones). */
class ArraysSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sigs = Seq(
    (1L, Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 7L)),   // 2 agree
    (2L, Array(5L, 5L, 5L, 5L), Array(5L, 5L, 5L, 5L)),   // all agree
    (3L, Array(-1L, 0L, 7L, 9L), Array(1L, 1L, 1L, 1L)),  // none agree
    (4L, Array[Long](), Array[Long]())                     // empty
  ).toDF("id", "a", "b")

  test("array_eq_count equals size(filter(zip_with(a,b,===)))") {
    val hof = size(filter(zip_with(col("a"), col("b"), (x, y) => x === y),
      p => p))
    val rows = sigs.select(col("id"),
      Arrays.eqCount(col("a"), col("b")).as("fast"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getInt(1) === r.getInt(2), s"id=${r.getLong(0)}"))
  }

  test("array_eq_count throws on length mismatch, propagates null arrays") {
    val df = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Arrays.eqCount(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("mismatched array lengths")))
    val n = Seq((Some(Array(1L)), Option.empty[Array[Long]]))
      .toDF("a", "b")
      .select(Arrays.eqCount(col("a"), col("b")).as("c")).collect()
    assert(n.head.isNullAt(0))
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (1L, Array(1L, 3L, 5L, 9L), Array(2L, 3L, 9L, 11L)),      // {3,9}
      (2L, Array(-5L, 0L, 2L), Array(-5L, 0L, 2L)),             // all
      (3L, Array(1L, 2L), Array(3L, 4L)),                       // none
      (4L, Array[Long](), Array(1L, 2L)),                       // empty side
      (5L, Array(Long.MinValue, 0L, Long.MaxValue),
        Array(Long.MinValue, Long.MaxValue))                    // extremes
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"),
      Arrays.sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    rows.foreach(r => assert(r.getInt(1) === r.getInt(2), s"id=${r.getLong(0)}"))
  }

  test("sorted_intersect_count throws on unsorted input instead of undercounting") {
    // the guard is merge-path-local: it fires when the walk VISITS a
    // descending step (a=[1,5,3] forces the walk onto the 5→3 drop)
    val df = Seq((Array(1L, 5L, 3L), Array(3L, 9L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Arrays.sortedIntersectCount(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("not ascending-sorted")))
  }

  test("banded_bucket_strings equals the sequence/slice/cast/array_join chain") {
    val df = Seq(
      (1L, Array(11L, -2L, 3L, 40L, 5L, 6L, 70L, 8L)),
      (2L, Array(0L, 0L, 0L, 0L, Long.MaxValue, Long.MinValue, 1L, -1L)),
      (3L, (1L to 64L).toArray)
    ).toDF("id", "sig")
    for (bands <- Seq(1, 2, 4, 8)) {
      val r = size(col("sig")).cast("long") / bands
      val chain = transform(sequence(lit(0), lit(bands - 1)),
        b => array_join(
          transform(slice(col("sig"), (b * r + 1).cast("int"), r.cast("int")),
            x => x.cast("string")), ","))
      val rows = df.select(col("id"),
        Arrays.bandedBucketStrings(col("sig"), bands).as("fast"),
        chain.as("ref")).collect()
      rows.foreach(r2 => assert(
        r2.getSeq[String](1) === r2.getSeq[String](2),
        s"bands=$bands id=${r2.getLong(0)}"))
    }
    // non-dividing bands throws (the assert_true contract)
    val e = intercept[Exception] {
      Seq((1L, Array(1L, 2L, 3L))).toDF("id", "sig")
        .select(Arrays.bandedBucketStrings(col("sig"), 2)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("must divide the signature length")))
  }

  test("both survive interpreted (non-codegen) evaluation equally") {
    // force the interpreted path via a config-off session clone
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.wholeStage", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    import s2.implicits._
    val df = Seq((Array(1L, 3L, 5L), Array(3L, 5L, 7L))).toDF("a", "b")
    val r = df.select(
      Arrays.eqCount(col("a"), col("b")).as("eq"),
      Arrays.sortedIntersectCount(col("a"), col("b")).as("ic")).collect().head
    assert(r.getInt(0) === 0)
    assert(r.getInt(1) === 2)
  }
}
