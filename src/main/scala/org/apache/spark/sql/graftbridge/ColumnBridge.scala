package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Catalyst Expression converters —
  * the supported way to attach a custom codegen'd `Expression` to the public
  * Column API in Spark 4 (Column is ColumnNode-backed; `new Column(expr)`
  * no longer exists). Kept to two one-liners so the internal surface we
  * depend on is minimal. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
