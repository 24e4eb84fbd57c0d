package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column↔Expression converters (Spark 4 moved
  * Column onto ColumnNode; classic mode exposes the conversion only inside
  * the sql package). This is the sanctioned extension seam for libraries
  * registering custom Catalyst expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
