package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expressions for the long-array set/sequence
  * primitives on the dedup candidate-verify hot paths.
  *
  * Both replace higher-order-function formulations that evaluate
  * INTERPRETED (a lambda frame + boxed Long per element, outside
  * whole-stage codegen — the q127/q131/q138 lesson, SCALE.md round 10):
  *
  *  - `size(filter(zip_with(a, b, (x,y) -> x === y), p -> p))` — the
  *    minhash signature-agreement count — allocates two intermediate
  *    arrays and runs 2·n lambda calls per CANDIDATE PAIR.
  *  - `size(array_intersect(a, b))` — the exact-verify intersection
  *    size — array_intersect builds an OpenHashSet and materializes the
  *    matching ELEMENTS, only for `size` to throw the array away.
  *    Measured on the q16/q136 verify stage at sf0.1: ~16 µs per
  *    candidate pair, the whole stage wall on 2-3 AQE-coalesced tasks.
  *
  * These generate a primitive long loop with zero allocation inside the
  * codegen'd join stage. Same semantics on the operators' inputs; both
  * throw on violated preconditions rather than degrade silently.
  *
  * Null handling: null ARRAYS propagate null (nullSafe*). Null
  * ELEMENTS: [[ArrayEqCount]] counts a position only when both sides
  * are non-null and equal (exactly `zip_with`'s null-propagating `===`
  * followed by `filter(p -> p)`, which drops nulls);
  * [[SortedIntersectCountExpr]] requires non-null elements (hashed
  * shingle sets are non-null by construction) and throws.
  */
final case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayExpressions.requireLongArrays(prettyName, left, right)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_eq_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      // a silently-truncated agreement count is a plausible-but-wrong
      // similarity estimate; length mismatch must fail loudly
      throw new IllegalArgumentException(
        s"array_eq_count: mismatched array lengths ($n vs ${y.numElements()})")
    }
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "array_eq_count: mismatched array lengths (" + $n + " vs " +
         |    $b.numElements() + ")");
         |}
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayEqCount =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| for two ascending-sorted long arrays with DISTINCT elements
  * (shingle-hash sets: distinct per doc by construction, sorted with
  * one `array_sort` before the broadcast) — a zero-allocation merge
  * scan instead of array_intersect's per-row hash set + materialized
  * result array. Sortedness is the caller's contract (an unsorted
  * input would UNDERCOUNT silently, so the merge throws on any
  * descending step its walk VISITS — a best-effort guard, not a full
  * sortedness check; the operators sort with `array_sort` immediately
  * upstream). */
final case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayExpressions.requireLongArrays(prettyName, left, right)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    var px = Long.MinValue; var py = Long.MinValue
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < px || yv < py) {
        throw new IllegalArgumentException(
          "sorted_intersect_count: input array not ascending-sorted")
      }
      if (xv == yv) { c += 1; px = xv; py = yv; i += 1; j += 1 }
      else if (xv < yv) { px = xv; i += 1 }
      else { py = yv; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val px = ctx.freshName("px")
      val py = ctx.freshName("py")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |long $px = Long.MIN_VALUE; long $py = Long.MIN_VALUE;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $px || $yv < $py) {
         |    throw new IllegalArgumentException(
         |      "sorted_intersect_count: input array not ascending-sorted");
         |  }
         |  if ($xv == $yv) { $c++; $px = $xv; $py = $yv; $i++; $j++; }
         |  else if ($xv < $yv) { $px = $xv; $i++; }
         |  else { $py = $yv; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

/** All LSH band-bucket strings of a signature in ONE pass: for band b
  * of `bands`, the comma-joined decimal rendering of signature
  * positions [b·r, (b+1)·r) with r = len/bands — byte-identical to the
  * `transform(sequence(...), b -> array_join(transform(slice(sig,
  * b·r+1, r), x -> cast(x as string)), ","))` chain it replaces
  * (verbatim band VALUES are the oracle-replayed bucket keys, so the
  * string format is the contract). The chain evaluated interpreted:
  * per document, bands slice allocations + len long→string casts +
  * bands array_joins, each through a lambda frame. Here: one loop,
  * one builder. Throws when `bands` does not divide the length (a
  * fractional band width would silently skip positions — same
  * fail-loud contract as the chain's assert_true). Null elements are
  * rejected (signatures are non-null by construction; array_join
  * would SKIP them silently). */
final case class BandedBucketStrings(child: Expression, bands: Int)
    extends UnaryExpression {
  require(bands >= 1, "banded_bucket_strings: bands must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayExpressions.requireLongArrays(prettyName, child)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "banded_bucket_strings"

  override protected def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val n = sig.numElements()
    if (n % bands != 0) {
      throw new IllegalArgumentException(
        s"bands ($bands) must divide the signature length")
    }
    val r = n / bands
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](bands)
    val sb = new java.lang.StringBuilder(r * 12)
    var b = 0
    var i = 0
    while (b < bands) {
      sb.setLength(0)
      var j = 0
      while (j < r) {
        if (sig.isNullAt(i)) {
          throw new IllegalArgumentException(
            "banded_bucket_strings: null signature element")
        }
        if (j > 0) sb.append(',')
        sb.append(sig.getLong(i))
        j += 1; i += 1
      }
      out(b) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("self", this,
        classOf[BandedBucketStrings].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.nullSafeEval($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BandedBucketStrings =
    copy(child = newChild)
}

private[functions] object ArrayExpressions {
  def requireLongArrays(fn: String, exprs: Expression*): TypeCheckResult = {
    val bad = exprs.filterNot(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires array<bigint> arguments, got " +
        bad.map(_.dataType.simpleString).mkString(", "))
  }
}

/** Column-API surface for the array primitives. */
object Arrays {
  /** Count of positions where two equal-length `array<bigint>` columns
    * agree (codegen'd; null elements never match). */
  def eqCount(a: Column, b: Column): Column =
    Bridge.column(ArrayEqCount(Bridge.expression(a), Bridge.expression(b)))

  /** |A ∩ B| of two ascending-sorted distinct-element `array<bigint>`
    * columns (codegen'd merge scan, zero allocation). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCountExpr(
      Bridge.expression(a), Bridge.expression(b)))

  /** The `bands` comma-joined band-value strings of an `array<bigint>`
    * signature (codegen'd single pass; throws when bands does not
    * divide the length). */
  def bandedBucketStrings(sig: Column, bands: Int): Column =
    Bridge.column(BandedBucketStrings(Bridge.expression(sig), bands))
}
