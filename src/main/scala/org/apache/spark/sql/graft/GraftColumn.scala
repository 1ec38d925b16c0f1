package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column lift for graft's native Catalyst expressions.
  *
  * Spark 4's classic `Column` wraps a `ColumnNode`, and every conversion
  * helper (`ExpressionUtils`, `ExpressionColumnNode`) is `private[sql]` —
  * there is no public API to wrap a custom `Expression` into a `Column`
  * short of registering it in a `FunctionRegistry` at session-build time,
  * which a library cannot do for sessions it does not construct (the
  * driver owns the `SparkSession` here). Declaring this one-file shim
  * inside an `org.apache.spark.sql` subpackage is the long-standing
  * extension-library pattern for exactly this gap.
  */
object GraftColumn {
  def apply(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
