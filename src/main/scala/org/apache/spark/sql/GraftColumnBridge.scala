package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` classic Column <-> catalyst Expression
  * converters — the supported way for an extension library to wrap a custom
  * Catalyst `Expression` as a user-facing `Column` in Spark 4's split
  * (connect/classic) Column API. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
