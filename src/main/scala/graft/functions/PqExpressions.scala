package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for product-quantization encode/score.
  *
  * The composed-Column formulation (per-codeword `aggregate(zip_with(…))`
  * distances inside a `sort_array(array(struct(…)))` argmin, times m
  * subspaces) inlines every codebook double as a codegen LITERAL —
  * m·k·dim ≈ 1–2k literals per operator, the exact anti-pattern
  * CLAUDE.md records (seconds of JIT per plan, re-paid on every
  * recompute). These expressions keep the codebooks OUT of the source
  * via `ctx.addReferenceObj` and emit one primitive loop; semantics are
  * bit-identical to the composed form (same left-to-right float folds,
  * same lowest-code tie-break), so the captured-codebook SQL oracles
  * replay unchanged.
  *
  * Codebooks are `m × k × (dim/m)` doubles; vectors are dense
  * `array<double>` (null ELEMENTS rejected loudly — a null read as 0.0
  * would produce plausible-but-wrong codes/scores, the silent failure
  * mode vec_dot's dimension check exists to prevent. Library call
  * sites pre-filter via Similarity.pqRows; the public Pq API enforces
  * the precondition itself).
  */
private[graft] object PqExpressions {
  def validate(books: Array[Array[Array[Double]]]): Unit = {
    require(books.nonEmpty && books(0).nonEmpty && books(0)(0).nonEmpty,
      "pq: codebooks must be non-empty (m x k x sub)")
    require(books.forall(b => b.length == books(0).length &&
        b.forall(_.length == books(0)(0).length)),
      "pq: codebooks must be rectangular")
  }

  /** One O(n) null-element pass before the hot loops (interpreted). */
  def requireNoNullElements(fn: String, x: ArrayData): Unit = {
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) throw new IllegalArgumentException(
        s"$fn: null element at index $i (pre-filter, see Similarity.pqRows)")
      i += 1
    }
  }

  /** The same null-element guard as generated Java. */
  def nullGuardCode(ctx: CodegenContext, fn: String, v: String): String = {
    val i = ctx.freshName("ni")
    s"""
       |for (int $i = 0; $i < $v.numElements(); $i++) {
       |  if ($v.isNullAt($i)) {
       |    throw new IllegalArgumentException(
       |      "$fn: null element at index " + $i +
       |      " (pre-filter, see Similarity.pqRows)");
       |  }
       |}
     """.stripMargin
  }
}

/** `array<int>` of m PQ codes: per subspace, the argmin-squared-distance
  * codeword (ties to the LOWEST code, the sort_array struct-order rule).
  * Distance is the same left-to-right `0.0 + Σ(x−y)²` fold as the
  * composed form, so codes are bit-for-bit reproducible. */
final case class PqEncodeExpr(child: Expression,
                              books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  PqExpressions.validate(books)

  private def m: Int = books.length
  private def sub: Int = books(0)(0).length
  private def dim: Int = m * sub

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireDoubleArrays(prettyName, child)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) {
      throw new IllegalArgumentException(
        s"pq_encode: vector length ${x.numElements()} != dim $dim")
    }
    PqExpressions.requireNoNullElements("pq_encode", x)
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val diff = x.getDouble(j * sub + i) - cw(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bs = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val cw = ctx.freshName("cw")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: vector length " + $v.numElements() + " != dim $dim");
         |}
         |${PqExpressions.nullGuardCode(ctx, "pq_encode", v)}
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $bs[$j].length; $c++) {
         |    double[] $cw = $bs[$j][$c];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $diff = $v.getDouble($j * $sub + $i) - $cw[$i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** `array<double>` reconstruction: the selected codeword per subspace,
  * concatenated — codebook values verbatim, no arithmetic. */
final case class PqReconstructExpr(child: Expression,
                                   books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  PqExpressions.validate(books)

  private def m: Int = books.length
  private def sub: Int = books(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_reconstruct requires array<int> codes, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_reconstruct"

  override protected def nullSafeEval(input: Any): Any = {
    val cs = input.asInstanceOf[ArrayData]
    if (cs.numElements() != m) {
      throw new IllegalArgumentException(
        s"pq_reconstruct: ${cs.numElements()} codes != m $m")
    }
    PqExpressions.requireNoNullElements("pq_reconstruct", cs)
    val out = new Array[Double](m * sub)
    var j = 0
    while (j < m) {
      val code = cs.getInt(j)
      if (code < 0 || code >= books(j).length) {
        throw new IllegalArgumentException(
          s"pq_reconstruct: code $code at subspace $j out of range " +
            s"[0, ${books(j).length})")
      }
      val cw = books(j)(code)
      System.arraycopy(cw, 0, out, j * sub, sub)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cs => {
      val bs = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      s"""
         |if ($cs.numElements() != $m) {
         |  throw new IllegalArgumentException(
         |    "pq_reconstruct: " + $cs.numElements() + " codes != m $m");
         |}
         |${PqExpressions.nullGuardCode(ctx, "pq_reconstruct", cs)}
         |double[] $out = new double[${m * sub}];
         |for (int $j = 0; $j < $m; $j++) {
         |  int ${j}_code = $cs.getInt($j);
         |  if (${j}_code < 0 || ${j}_code >= $bs[$j].length) {
         |    throw new IllegalArgumentException(
         |      "pq_reconstruct: code " + ${j}_code + " at subspace " + $j +
         |      " out of range [0, " + $bs[$j].length + ")");
         |  }
         |  System.arraycopy($bs[$j][${j}_code], 0, $out, $j * $sub, $sub);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqReconstructExpr =
    copy(child = newChild)
}

/** ADC partial-dot score: Σ_j (Σ_i books[j][codes[j]][i] · q[j·sub+i]),
  * inner folds left-to-right and the outer sum in subspace order
  * (s₀ + s₁ + …, no leading 0.0) — the exact float order of the
  * composed per-subspace `aggregate(...).reduce(_ + _)` form, so the
  * SQL oracle's per-subspace `list_aggregate` terms replay it. */
final case class PqAdcExpr(left: Expression, right: Expression,
                           books: Array[Array[Array[Double]]])
    extends BinaryExpression {
  PqExpressions.validate(books)

  private def m: Int = books.length
  private def sub: Int = books(0)(0).length
  private def dim: Int = m * sub

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<int> codes, array<double> query), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val cs = a.asInstanceOf[ArrayData]
    val q = b.asInstanceOf[ArrayData]
    if (cs.numElements() != m || q.numElements() != dim) {
      throw new IllegalArgumentException(
        s"pq_adc: got ${cs.numElements()} codes / ${q.numElements()} dims, " +
          s"want $m / $dim")
    }
    PqExpressions.requireNoNullElements("pq_adc", cs)
    PqExpressions.requireNoNullElements("pq_adc", q)
    var total = 0.0
    var j = 0
    while (j < m) {
      val code = cs.getInt(j)
      if (code < 0 || code >= books(j).length) {
        throw new IllegalArgumentException(
          s"pq_adc: code $code at subspace $j out of range [0, ${books(j).length})")
      }
      val cw = books(j)(code)
      var s = 0.0
      var i = 0
      while (i < sub) { s += cw(i) * q.getDouble(j * sub + i); i += 1 }
      total = if (j == 0) s else total + s
      j += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cs, q) => {
      val bs = ctx.addReferenceObj("pqBooks", books, "double[][][]")
      val total = ctx.freshName("total")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val cw = ctx.freshName("cw")
      s"""
         |if ($cs.numElements() != $m || $q.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "pq_adc: got " + $cs.numElements() + " codes / " +
         |    $q.numElements() + " dims, want $m / $dim");
         |}
         |${PqExpressions.nullGuardCode(ctx, "pq_adc", cs)}
         |${PqExpressions.nullGuardCode(ctx, "pq_adc", q)}
         |double $total = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int ${j}_code = $cs.getInt($j);
         |  if (${j}_code < 0 || ${j}_code >= $bs[$j].length) {
         |    throw new IllegalArgumentException(
         |      "pq_adc: code " + ${j}_code + " at subspace " + $j +
         |      " out of range [0, " + $bs[$j].length + ")");
         |  }
         |  double[] $cw = $bs[$j][${j}_code];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $sub; $i++) {
         |    $s += $cw[$i] * $q.getDouble($j * $sub + $i);
         |  }
         |  $total = ($j == 0) ? $s : ($total + $s);
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** The `take` nearest coarse-quantizer cells for a vector, ordered by
  * (squared euclidean distance asc, cell asc) — the sort_array struct
  * order of the composed form, same left-to-right distance folds.
  * `take` = 1 is corpus assignment; `take` = nProbe is query probing. */
final case class IvfCellsExpr(child: Expression,
                              centroids: Array[Array[Double]],
                              take: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty && centroids(0).nonEmpty,
    "ivf_cells: centroids must be non-empty")
  require(centroids.forall(_.length == centroids(0).length),
    "ivf_cells: centroids must be rectangular")
  require(take >= 1 && take <= centroids.length,
    s"ivf_cells: take must be in [1, ${centroids.length}], got $take")

  private def dim: Int = centroids(0).length
  private def n: Int = centroids.length

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireDoubleArrays(prettyName, child)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_cells"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) {
      throw new IllegalArgumentException(
        s"ivf_cells: vector length ${x.numElements()} != dim $dim")
    }
    val d = new Array[Double](n)
    var c = 0
    while (c < n) {
      val ctr = centroids(c)
      var s = 0.0
      var i = 0
      while (i < dim) {
        val diff = x.getDouble(i) - ctr(i)
        s += diff * diff
        i += 1
      }
      d(c) = s
      c += 1
    }
    // selection of the `take` smallest by (d, cell): n is small (the
    // cell count), so O(take·n) beats sort bookkeeping
    val out = new Array[Int](take)
    val used = new Array[Boolean](n)
    var t = 0
    while (t < take) {
      var best = -1
      var c2 = 0
      while (c2 < n) {
        if (!used(c2) && (best < 0 || d(c2) < d(best))) best = c2
        c2 += 1
      }
      used(best) = true
      out(t) = best
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cs = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
      val d = ctx.freshName("d")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val diff = ctx.freshName("diff")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val c2 = ctx.freshName("c2")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "ivf_cells: vector length " + $v.numElements() + " != dim $dim");
         |}
         |double[] $d = new double[$n];
         |for (int $c = 0; $c < $n; $c++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $diff = $v.getDouble($i) - $cs[$c][$i];
         |    $s += $diff * $diff;
         |  }
         |  $d[$c] = $s;
         |}
         |int[] $out = new int[$take];
         |boolean[] $used = new boolean[$n];
         |for (int $t = 0; $t < $take; $t++) {
         |  int $best = -1;
         |  for (int $c2 = 0; $c2 < $n; $c2++) {
         |    if (!$used[$c2] && ($best < 0 || $d[$c2] < $d[$best])) $best = $c2;
         |  }
         |  $used[$best] = true;
         |  $out[$t] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IvfCellsExpr =
    copy(child = newChild)
}

/** Column-API surface for the PQ expressions. */
object Pq {
  /** m argmin codes for an `array<double>` vector (codegen'd). */
  def encode(v: Column, books: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncodeExpr(Bridge.expression(v), books))

  /** Codebook reconstruction of an `array<int>` codes column. */
  def reconstruct(codes: Column, books: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqReconstructExpr(Bridge.expression(codes), books))

  /** ADC dot of codes against a query vector (codegen'd). */
  def adc(codes: Column, query: Column,
          books: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqAdcExpr(Bridge.expression(codes),
      Bridge.expression(query), books))

  /** The `take` nearest IVF cells, ordered (dist asc, cell asc). */
  def ivfCells(v: Column, centroids: Array[Array[Double]],
               take: Int): Column =
    Bridge.column(IvfCellsExpr(Bridge.expression(v), centroids, take))
}
