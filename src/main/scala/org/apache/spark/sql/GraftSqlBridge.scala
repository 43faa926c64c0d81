package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters —
  * the standard extension-point pattern for libraries that ship
  * custom Catalyst expressions (Spark 4 hides the Column(expr)
  * constructor behind the column-node API).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
