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

  /** Rebind a V1 streaming sink's microbatch DataFrame as a plain batch
    * plan over the SAME already-planned rows (the exact rebinding
    * ForeachBatchSink performs): the frame handed to `Sink.addBatch` is
    * tied to the microbatch's IncrementalExecution, so feeding it to a
    * writer that re-plans it (the engine's log appends re-select and
    * re-partition) needs a batch-mode LogicalRDD, not the streaming plan. */
  def rebatch(df: Dataset[Row]): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(cdf.sparkSession,
      execution.LogicalRDD.fromDataset(
        cdf.queryExecution.toRdd, cdf, isStreaming = false))
  }
}
