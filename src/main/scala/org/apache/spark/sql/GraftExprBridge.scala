package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql-private Column ⇄ Expression converters, for graft's
  * custom Catalyst expressions. Lives in this package solely to satisfy
  * `private[sql]` access; contains no logic. */
object GraftExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully convert a Column's node tree to a catalyst Expression (resolving
    * function names through the active session's registry). `expression`
    * above returns a lazy ColumnNodeExpression placeholder — fine inside
    * Dataset transformations, but Unevaluable when embedded somewhere the
    * analyzer won't unwrap it, e.g. a SQL FunctionBuilder's return value. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
