package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Training corpora mix composed ("é" U+00E9) and decomposed
  * ("e"+U+0301) encodings of the same text; without canonicalization
  * they hash apart — dedup misses them, vocabularies split, and quality
  * scores drift. Spark has no normalization builtin, and a Scala UDF
  * would break whole-stage codegen on the hottest path in the pipeline
  * (the normalization pass touches every byte of the corpus). This
  * expression stays inside the codegen'd scan stage and fast-paths
  * already-normalized strings (the overwhelming majority) without
  * allocating.
  *
  * `java.text.Normalizer` implements UAX #15 — the same algorithm
  * DuckDB's `nfc_normalize` (utf8proc) implements, so results are
  * oracle-comparable across engines.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      // isNormalized is a scan, not a rewrite: the already-NFC fast
      // path returns the input object and allocates nothing
      s"""
         |String $s = $c.toString();
         |${ev.value} =
         |  java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Column-API surface for the string expressions. */
object Strings {
  /** Unicode NFC canonicalization of a string column (codegen'd). */
  def nfc(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
