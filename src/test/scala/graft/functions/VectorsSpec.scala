package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorsSpec extends SparkSpec {
  import spark.implicits._

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

  test("mismatched lengths fail loudly (no silent truncation)") {
    val d = Seq((1L, Array(1.0, 2.0, 3.0), Array(10.0))).toDF("id", "a", "b")
    val e = intercept[Exception] {
      d.select(Vectors.dot($"a", $"b")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("mismatched vector lengths")))
  }
}
