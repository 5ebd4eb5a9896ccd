package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for wrapping custom Catalyst expressions into user-facing
  * Columns: `ExpressionUtils` is `private[sql]` in Spark 4's classic
  * module, so the (one-line) accessors live in this package. No Spark
  * internals are modified — this only re-exports the supported
  * Column ⇄ Expression conversion.
  */
object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
