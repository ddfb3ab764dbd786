package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal accessor for the `private[sql]` Column <-> Expression conversions
 * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 removed the public
 * `new Column(expr)` constructor; placing this shim inside the
 * `org.apache.spark.sql` namespace is the standard way third-party libraries
 * bind native Catalyst expressions to the Column API without a session-bound
 * function registry.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
