package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark API: wrapping a custom
  * Catalyst [[Expression]] in a user-facing [[Column]] (and back). Spark
  * 4 hid the direct `new Column(expr)` constructor behind
  * `classic.ExpressionUtils`; living under `org.apache.spark.sql` grants
  * the package-private access. No behavior here — two delegating calls.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
