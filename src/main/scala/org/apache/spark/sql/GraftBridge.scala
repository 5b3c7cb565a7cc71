package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column↔Expression conversion for the
  * engine's native Catalyst expressions (the established pattern for
  * third-party Spark extensions — the classic API hides these behind
  * package-private since the Connect refactor). Nothing else from the
  * private surface is touched.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
