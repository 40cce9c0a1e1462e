package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ↔ Expression converters —
  * the supported classic-API path for libraries that ship native Catalyst
  * expressions (Spark 4 Columns wrap ColumnNodes, not Expressions, so a
  * custom `Expression` needs this hop to become a user-facing `Column`).
  * This is the only file that lives outside the `graft` namespace.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
