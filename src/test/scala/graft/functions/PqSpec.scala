package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The PQ/IVF codegen expressions vs the composed-Column formulations
  * they replaced: equality must be BIT-exact (the captured-codebook SQL
  * oracles replay the composed forms' float orders), asserted here on
  * deterministic pseudo-random vectors so a codegen refactor can't
  * drift an ulp silently.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val m = 2
  private val sub = dim / m

  // deterministic pseudo-random doubles (no RNG state, reproducible)
  private def gen(seed: Int, n: Int): Array[Double] =
    Array.tabulate(n) { i =>
      val h = ((seed * 2654435761L + i * 40503L) & 0xffffL).toDouble
      h / 65536.0 * 2.0 - 1.0
    }

  private val books: Array[Array[Array[Double]]] =
    Array.tabulate(m, 4, sub)((j, c, i) => gen(j * 100 + c, sub)(i))
  private val centroids: Array[Array[Double]] =
    Array.tabulate(5, dim)((c, i) => gen(1000 + c, dim)(i))

  private lazy val df = (1 to 50).map(s => (s.toLong, gen(s, dim)))
    .toDF("id", "v")

  /** The pre-round-5 composed argmin encode, kept as the reference. */
  private def composedCodes = array((0 until m).map { j =>
    val dists = books(j).zipWithIndex.map { case (cw, c) =>
      val litC = array(cw.map(lit): _*)
      struct(aggregate(zip_with(slice(col("v"), j * sub + 1, sub), litC,
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, x) => a + x).as("d"), lit(c).as("c"))
    }
    sort_array(array(dists: _*)).getItem(0).getField("c")
  }: _*)

  test("pq encode equals the composed argmin bit-for-bit") {
    val rows = df.select(Pq.encode(col("v"), books).as("fast"),
      composedCodes.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](0) === r.getSeq[Int](1))
    }
  }

  test("pq reconstruct returns codebook values verbatim, in order") {
    val r = df.select(Pq.reconstruct(
        Pq.encode(col("v"), books), books).as("dq"),
      Pq.encode(col("v"), books).as("codes")).collect()
    r.foreach { row =>
      val dq = row.getSeq[Double](0)
      val cs = row.getSeq[Int](1)
      (0 until m).foreach { j =>
        assert(dq.slice(j * sub, (j + 1) * sub) === books(j)(cs(j)).toSeq)
      }
    }
  }

  test("pq adc equals the composed per-subspace reduce bit-for-bit") {
    val composedAdc = (0 until m).map { j =>
      val bookLit = array(books(j).map(cw => array(cw.map(lit): _*)): _*)
      val cw = element_at(bookLit, element_at(col("codes"), j + 1) + 1)
      aggregate(zip_with(cw, slice(col("q"), j * sub + 1, sub),
        (x, y) => x * y), lit(0.0), (a, x) => a + x)
    }.reduce(_ + _)
    val rows = df
      .withColumn("codes", Pq.encode(col("v"), books))
      .withColumn("q", col("v"))
      .select(Pq.adc(col("codes"), col("q"), books).as("fast"),
        composedAdc.as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("ivf cells equals the composed sorted-struct order") {
    val composed = {
      val dists = centroids.zipWithIndex.map { case (ctr, c) =>
        val litC = array(ctr.map(lit): _*)
        struct(aggregate(zip_with(col("v"), litC, (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x).as("d"), lit(c).as("cell"))
      }
      transform(sort_array(array(dists: _*)), s => s.getField("cell"))
    }
    val rows = df.select(
      Pq.ivfCells(col("v"), centroids, centroids.length).as("fast"),
      composed.as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
  }

  // The guards must hold in BOTH evaluation paths: interpreted eval and
  // generated Java diverge exactly when one path's guard is missing
  // (UnsafeArrayData.getDouble on a null slot silently returns 0.0).
  private def inBothEvalModes(f: => Unit): Unit =
    Seq("CODEGEN_ONLY", "NO_CODEGEN").foreach { mode =>
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try f
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }

  private def msgsOf(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x =>
      String.valueOf(x.getMessage) +: msgsOf(x.getCause))

  private def assertThrowsWith(tag: String)(f: => Unit): Unit = {
    val e = intercept[Exception](f)
    assert(msgsOf(e).exists(_.contains(tag)), s"expected '$tag' in: ${msgsOf(e)}")
  }

  test("null elements fail loudly in encode/reconstruct/adc, both eval modes") {
    val nullVec = Seq(Tuple1(Seq[java.lang.Double](
      1.0, null, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0))).toDF("v")
    val goodCodes = typedLit(Seq(0, 0))
    inBothEvalModes {
      assertThrowsWith("pq_encode: null element") {
        nullVec.select(Pq.encode(col("v"), books)).collect()
      }
      assertThrowsWith("pq_adc: null element") {
        nullVec.select(Pq.adc(goodCodes, col("v"), books)).collect()
      }
      val nullCodes = Seq(Tuple1(Seq[Integer](0, null))).toDF("c")
        .withColumn("q", typedLit((1 to dim).map(_.toDouble)))
      assertThrowsWith("pq_reconstruct: null element") {
        nullCodes.select(Pq.reconstruct(col("c"), books)).collect()
      }
      assertThrowsWith("pq_adc: null element") {
        nullCodes.select(Pq.adc(col("c"), col("q"), books)).collect()
      }
    }
  }

  test("out-of-range codes fail loudly in reconstruct/adc, both eval modes") {
    val badCodes = Seq(Tuple1(Seq(99, 0))).toDF("c")
      .withColumn("q", typedLit((1 to dim).map(_.toDouble)))
    inBothEvalModes {
      assertThrowsWith("pq_reconstruct: code 99") {
        badCodes.select(Pq.reconstruct(col("c"), books)).collect()
      }
      assertThrowsWith("pq_adc: code 99") {
        badCodes.select(Pq.adc(col("c"), col("q"), books)).collect()
      }
    }
  }

  test("null vectors propagate null; wrong dims fail loudly") {
    val withNull = Seq((1L, Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)),
      (2L, null.asInstanceOf[Array[Double]])).toDF("id", "v")
    val out = withNull.select(Pq.encode(col("v"), books)).collect()
    assert(out(1).isNullAt(0))
    val bad = Seq(Tuple1(Array(1.0, 2.0))).toDF("v")
    val e = intercept[Exception] {
      bad.select(Pq.encode(col("v"), books)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("pq_encode")))
  }
}
