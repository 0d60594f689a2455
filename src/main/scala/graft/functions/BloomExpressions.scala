package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd predicate.
  *
  * The built-in surface has no public might-contain function, and a
  * Scala UDF would break whole-stage codegen exactly where this
  * predicate must live — fused into the corpus scan, gating billions of
  * shingle rows map-side ([[graft.ext.Dedup.decontaminateBloom]]). The
  * filter object rides `ctx.addReferenceObj` (the big-constant rule —
  * a multi-MB sketch must never inline into generated source) and the
  * generated call is one `mightContainLong` per row.
  *
  * Null input → null (nullSafe*): a null digest is unknowable
  * membership, not a miss.
  */
final case class BloomMightContainLong(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(h: Any): Any =
    bf.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.mightContainLong($h);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

/** Column-API surface for the bloom expressions. */
object Blooms {
  /** True iff the bloom filter might contain the `bigint` column value
    * (no false negatives; false-positive rate set at build time). */
  def mightContainLong(h: Column, bf: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(h), bf))
}
