package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column↔Expression converters (Spark 4 moved
  * Column onto ColumnNode; classic mode exposes the conversion only inside
  * the sql package). This is the sanctioned extension seam for libraries
  * registering custom Catalyst expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Convert a Column to Catalyst EAGERLY (no lazy ColumnNodeExpression
    * wrapper). Required where the result is spliced into a plan the
    * analyzer inspects structurally before node conversion runs — e.g. a
    * SQL FunctionBuilder result under an ExtractValue (`f(x)[0]`), whose
    * base type the analyzer reads immediately. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
