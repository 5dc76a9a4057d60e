package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Catalyst Expression bridge. Spark 4 made the conversion
 * (`ExpressionUtils`) `private[sql]`, so wrapping a custom codegen
 * expression (e.g. [[graft.plans.SimHashExpression]]) into a `Column`
 * WITHOUT registering it in a session's FunctionRegistry requires a
 * shim inside the `org.apache.spark.sql` package — the standard
 * pattern Spark connector/extension libraries use. Nothing here adds
 * behavior; it only re-exports the two conversions.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
