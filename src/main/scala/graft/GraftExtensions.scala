package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, NfcNormalize, SquaredNorm}

/** Session extension registering graft's custom expressions as SQL
  * functions, so `spark.sql("SELECT vec_dot(a, b) ...")` works next to
  * the Column API. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (name, info, builder) triples — also usable to register on an
    * existing session via [[install]]. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double> vectors"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("vec_sqnorm",
      info("vec_sqnorm", "vec_sqnorm(a) - squared L2 norm of an array<double> vector"),
      (es: Seq[Expression]) => SquaredNorm(es(0))),
    ("nfc_normalize",
      info("nfc_normalize", "nfc_normalize(s) - Unicode NFC canonicalization"),
      (es: Seq[Expression]) => NfcNormalize(es(0))))

  /** Register the functions on an already-running session (tests, REPL). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, i, b) =>
      reg.registerFunction(FunctionIdentifier(name), i, b)
    }
  }
}
