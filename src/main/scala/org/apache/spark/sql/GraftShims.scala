package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column<->Expression converters so custom
  * Catalyst expressions can be exposed as Columns (Spark 4 moved Column onto
  * ColumnNode; classic.ExpressionUtils holds the conversion).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
