package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Expression ↔ Column converters, for
  * wiring custom Catalyst expressions ([[graft.functions.SimilarityKernel]])
  * into the public Column API. Lives in the `org.apache.spark.sql`
  * namespace solely for access — the standard pattern for Catalyst
  * extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
