package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the sql-private Column ↔ Expression converters —
  * the supported way for third-party expression libraries to surface
  * native Catalyst expressions as Columns on Spark 4's decoupled
  * Column API. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
