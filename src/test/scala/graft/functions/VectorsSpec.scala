package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private def causeMessages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x =>
      String.valueOf(x.getMessage) +: causeMessages(x.getCause))

  private lazy val df = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0)),
    (3L, Array(-1.0, 2.5), Array(3.0, -4.0))
  ).toDF("id", "a", "b")

  test("codegen dot product equals the higher-order-function formulation") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(col("id"), Vectors.dot(col("a"), col("b")).as("fast"),
      hof.as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(1) === r.getDouble(2)))
  }

  test("float and mixed-width dot is bit-identical to cast-then-dot") {
    // widening per element == casting the array first: every float is
    // exactly a double and the MAC runs in double either way. Pinned
    // bit-for-bit because the dedup oracles depend on it.
    val fdf = Seq(
      (1L, Array(1.1f, -2.7f, 3.3f), Array(0.9, 5.0, -6.25)),
      (2L, Array(0.37f, 1e-8f, 42.0f), Array(1.5, -2.5, 3.5))
    ).toDF("id", "f", "d")
    val rows = fdf.select(
      Vectors.dot(col("f"), col("d")).as("mixed"),
      Vectors.dot(col("f").cast("array<double>"), col("d")).as("cast"),
      Vectors.dot(col("f"), col("f")).as("ff"),
      Vectors.dot(col("f").cast("array<double>"),
        col("f").cast("array<double>")).as("ffcast")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }
  }

  test("dot and norm produce expected values") {
    val r = df.filter($"id" === 1L)
      .select(Vectors.dot($"a", $"b"), Vectors.norm($"a"),
        Vectors.cosine($"a", $"a")).collect().head
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("null arrays propagate null; interpreted eval matches codegen") {
    val withNull = Seq((1L, Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("id", "a", "b")
    val r = withNull.select(Vectors.dot($"a", $"b")).collect().head
    assert(r.isNullAt(0))
    // interpreted path (eval without codegen) on catalyst literals
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit2 = DotProduct(
      Literal.create(Array(1.0, 2.0), ArrayType(DoubleType)),
      Literal.create(Array(3.0, 4.0), ArrayType(DoubleType)))
    assert(lit2.eval(null) === 11.0)
  }

  test("signLshBuckets equals the expanded per-plane formulation bit-for-bit") {
    val planes = Similarity_md5Planes
    val vecs = Seq(
      (1L, Array.tabulate(64)(i => math.sin(i + 1.0))),
      (2L, Array.tabulate(64)(i => -0.5 + (i % 7) * 0.2)),
      (3L, Array.fill(64)(0.0))) // all-zero: dot = 0 counts as >= 0
      .toDF("id", "v")
    val fast = vecs.select($"id", Vectors.signLshBuckets($"v", planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // expanded reference: one when(dot >= 0) per (table, plane)
    val slow = vecs.select($"id" +: planes.indices.map { t =>
        planes(t).indices.map { p =>
          when(Vectors.dot($"v", array(planes(t)(p).map(lit): _*)) >= 0,
            lit(1L << p)).otherwise(lit(0L))
        }.reduce(_ + _).as(s"b$t")
      }: _*)
      .collect().map(r => r.getLong(0) ->
        planes.indices.map(t => r.getLong(t + 1))).toMap
    vecs.collect().map(_.getLong(0)).foreach { id =>
      assert(fast(id) === slow(id), s"id $id")
    }
  }

  test("signLshBuckets: null propagates, wrong dim fails loudly") {
    val planes = Similarity_md5Planes
    val withNull = Seq((1L, Option.empty[Array[Double]])).toDF("id", "v")
    assert(withNull.select(Vectors.signLshBuckets($"v", planes))
      .collect().head.isNullAt(0))
    val short = Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
    val e = intercept[Exception] {
      short.select(Vectors.signLshBuckets($"v", planes)).collect()
    }
    assert(causeMessages(e).exists(_.contains("plane dim")))
  }

  private lazy val Similarity_md5Planes =
    graft.ext.Similarity.md5SignPlanes(tables = 4, nPlanes = 8, dim = 64)

  test("mismatched lengths fail loudly (no silent truncation)") {
    val d = Seq((1L, Array(1.0, 2.0, 3.0), Array(10.0))).toDF("id", "a", "b")
    val e = intercept[Exception] {
      d.select(Vectors.dot($"a", $"b")).collect()
    }
    assert(causeMessages(e).exists(_.contains("mismatched vector lengths")))
  }
}
