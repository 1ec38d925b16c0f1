package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column lift for graft's native Catalyst expressions.
  *
  * Spark 4's classic `Column` wraps a `ColumnNode`, and every conversion
  * helper (`ExpressionUtils`, `ExpressionColumnNode`) is `private[sql]` —
  * there is no public API to wrap a custom `Expression` into a `Column`
  * outside a `FunctionRegistry` entry. Declaring this one-file shim
  * inside an `org.apache.spark.sql` subpackage is the long-standing
  * extension-library pattern for the gap; the registry route DOES exist
  * too (SQL-text callers get it via `graft.sql.GraftFunctions`), but the
  * Scala DataFrame API still needs this direct lift — a registry
  * function resolves names during analysis, not `Column` values at
  * call sites.
  */
object GraftColumn {
  def apply(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
