package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Expression↔Column converters that Spark 4
  * moved behind the Column-node API. Lives in `org.apache.spark.sql` for
  * access — the standard extension-point pattern for libraries that build
  * native Catalyst expressions with non-SQL-expressible constructor args
  * (e.g. a Broadcast handle, which cannot round-trip through the function
  * registry's string interface).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
