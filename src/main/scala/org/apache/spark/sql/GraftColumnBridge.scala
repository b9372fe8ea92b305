package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * Column onto ColumnNode; `classic.ExpressionUtils` is the supported
  * internal shim). Lets graft's custom Catalyst expressions build `Column`s
  * directly — no per-session registry round-trip on library call paths.
  * Lives in this package solely for access; keep it to these two calls. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
