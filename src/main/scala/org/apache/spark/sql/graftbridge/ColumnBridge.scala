package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Expression<->Column bridge `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils). This package-located
  * shim re-exports the two conversions the engine needs to register its
  * custom TypedImperativeAggregate as a Column. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
