package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for dense-vector arithmetic.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)`)
  * allocates a lambda frame per element and never enters whole-stage
  * codegen's tight loop — at 12.5M pairs × 64 dims that was ~46 s of the
  * sf0.1 bench. These expressions generate a primitive double loop
  * (`doGenCode`) and sit inside the codegen'd join stage: same semantics,
  * ~an order of magnitude cheaper. This is the one place the built-in
  * surface genuinely can't express the operation efficiently (SURVEY.md
  * §7 "custom candidates").
  *
  * Null handling: null arrays propagate null (nullSafe*); null ELEMENTS
  * are not supported (embeddings are dense) — callers must ensure
  * non-null elements.
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Each side may be array<float> OR array<double>, independently: a
  // float32 embedding read straight off parquet dots against a double
  // centroid/query without a per-row cast-allocation in the hot join
  // loop. Widening float→double per ELEMENT is exact (every float is a
  // double), and the multiply-accumulate runs in double either way, so
  // the result is bit-identical to casting the whole array first — the
  // sf10 run measured the pre-join `cast(array<double>)` DOUBLING the
  // candidate shuffle and the post-join cast allocating two arrays per
  // candidate pair.
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireFloatOrDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      // a silently-truncated dot product is a plausible-but-wrong
      // similarity; dimension mismatch must fail loudly
      throw new IllegalArgumentException(
        s"vec_dot: mismatched vector lengths ($n vs ${y.numElements()})")
    }
    val lf = isFloat(left); val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val ax = if (isFloat(left)) s"(double) $a.getFloat($i)"
               else s"$a.getDouble($i)"
      val bx = if (isFloat(right)) s"(double) $b.getFloat($i)"
               else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: mismatched vector lengths (" + $n + " vs " +
         |    $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $ax * $bx;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ x² over a dense double array (codegen'd); see [[DotProduct]]. */
final case class SquaredNorm(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireDoubleArrays(prettyName, child)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sqnorm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) { val v = x.getDouble(i); s += v * v; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SquaredNorm =
    copy(child = newChild)
}

/** All sign-LSH bucket ids of a vector in ONE expression: for each
  * hyperplane table t, bucket(t) = Σ_p (dot(v, plane(t)(p)) ≥ 0) << p.
  *
  * The expanded formulation — 128 separate `when(dot(v, array(64
  * literals)) ≥ 0, …)` columns — inlines tables×planes×dim literal
  * doubles into the generated Java (8192 for the 16×8×64 default),
  * which costs seconds of one-time whole-stage-codegen JIT per session
  * and evaluates 128 independent loops per row. Here the planes ride
  * along as a codegen REFERENCE OBJECT and one compiled triple loop
  * produces every bucket: milliseconds to compile, one pass per row,
  * bit-identical results (same per-plane accumulation order as
  * [[DotProduct]], so the md5-replayed SQL oracles still match).
  */
final case class SignLshBucketsExpr(child: Expression,
                                    planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes(0).nonEmpty && planes(0)(0).nonEmpty,
    "sign_lsh_buckets: planes must be non-empty (tables x planes x dim)")
  require(planes.forall(t => t.length == planes(0).length &&
      t.forall(_.length == planes(0)(0).length)),
    "sign_lsh_buckets: planes must be rectangular")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireDoubleArrays(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_lsh_buckets"

  private def dim: Int = planes(0)(0).length

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) {
      throw new IllegalArgumentException(
        s"sign_lsh_buckets: vector length ${x.numElements()} != plane dim $dim")
    }
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      var bucket = 0L
      var p = 0
      while (p < planes(t).length) {
        val pl = planes(t)(p)
        var s = 0.0
        var i = 0
        while (i < dim) { s += x.getDouble(i) * pl(i); i += 1 }
        // !(s < 0), not (s >= 0): SQL comparison semantics order NaN
        // above every number (Spark's `when(dot >= 0)` and DuckDB's
        // CASE both set the bit for NaN); plain Java >= would clear it
        if (!(s < 0)) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ps = ctx.addReferenceObj("planes", planes, "double[][][]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val pl = ctx.freshName("pl")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($c.numElements() != ${dim}) {
         |  throw new IllegalArgumentException(
         |    "sign_lsh_buckets: vector length " + $c.numElements() +
         |    " != plane dim ${dim}");
         |}
         |long[] $out = new long[${planes.length}];
         |for (int $t = 0; $t < ${planes.length}; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $ps[$t].length; $p++) {
         |    double[] $pl = $ps[$t][$p];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < ${dim}; $i++) {
         |      $s += $c.getDouble($i) * $pl[$i];
         |    }
         |    if (!($s < 0)) $bucket |= (1L << $p); // NaN sets the bit (SQL semantics)
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignLshBucketsExpr =
    copy(child = newChild)
}

/** Dense matrix-vector product: out[j] = Σ_i matrix(j)(i) · v[i], each
  * output dim folded in ascending index order — the random-projection
  * (Johnson–Lindenstrauss) primitive that maps a stored embedding to a
  * low-dim sketch map-side, zero shuffle.
  *
  * The matrix rides as a codegen REFERENCE OBJECT (the
  * [[SignLshBucketsExpr]] lesson: inlining outDim×dim literal doubles
  * into the generated Java costs seconds of one-time JIT per plan and
  * is re-paid inside iterative loops); one compiled double loop
  * produces every output dim. Input may be array<float> (parquet
  * embeddings, widened exactly per element like [[DotProduct]]) or
  * array<double>.
  */
final case class MatVecExpr(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  require(matrix.nonEmpty && matrix(0).nonEmpty,
    "mat_vec: matrix must be non-empty (outDim x dim)")
  require(matrix.forall(_.length == matrix(0).length),
    "mat_vec: matrix must be rectangular")

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireFloatOrDoubleArrays(prettyName, child)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"

  private def dim: Int = matrix(0).length
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) {
      // a silently-truncated projection is a plausible-but-wrong sketch
      throw new IllegalArgumentException(
        s"mat_vec: vector length ${x.numElements()} != matrix dim $dim")
    }
    val out = new Array[Double](matrix.length)
    var j = 0
    while (j < matrix.length) {
      val row = matrix(j)
      var s = 0.0
      var i = 0
      while (i < dim) {
        s += (if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)) * row(i)
        i += 1
      }
      out(j) = s
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("matrix", matrix, "double[][]")
      val get = if (isFloat) s"(double) $c.getFloat" else s"$c.getDouble"
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      s"""
         |if ($c.numElements() != ${dim}) {
         |  throw new IllegalArgumentException(
         |    "mat_vec: vector length " + $c.numElements() +
         |    " != matrix dim ${dim}");
         |}
         |double[] $out = new double[${matrix.length}];
         |for (int $j = 0; $j < ${matrix.length}; $j++) {
         |  double[] $row = $m[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < ${dim}; $i++) {
         |    $s += $get($i) * $row[$i];
         |  }
         |  $out[$j] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MatVecExpr =
    copy(child = newChild)
}

private[functions] object VectorExpressions {
  def requireDoubleArrays(fn: String, exprs: Expression*): TypeCheckResult = {
    val bad = exprs.filterNot(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<double> arguments, got " +
        bad.map(_.dataType.simpleString).mkString(", "))
  }

  def requireFloatOrDoubleArrays(fn: String, exprs: Expression*): TypeCheckResult = {
    val bad = exprs.filterNot(_.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    })
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<float> or array<double> arguments, got " +
        bad.map(_.dataType.simpleString).mkString(", "))
  }
}

/** Column-API surface for the vector expressions. */
object Vectors {
  /** Dot product of two `array<double>` columns (codegen'd). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm of an `array<double>` column (codegen'd). */
  def norm(a: Column): Column =
    sqrt(Bridge.column(SquaredNorm(Bridge.expression(a))))

  /** Cosine similarity of two `array<double>` columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** One `array<long>` of sign-LSH bucket ids (one per table) for an
    * `array<double>` vector column (codegen'd single pass). */
  def signLshBuckets(v: Column, planes: Array[Array[Array[Double]]]): Column =
    Bridge.column(SignLshBucketsExpr(Bridge.expression(v), planes))

  /** Matrix-vector product of an `array<float>`/`array<double>` column
    * against a plan-time constant matrix (codegen'd single pass) —
    * `array<double>` of length matrix.length. */
  def matVec(v: Column, matrix: Array[Array[Double]]): Column =
    Bridge.column(MatVecExpr(Bridge.expression(v), matrix))
}
