package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters of Spark 4
  * (Column is a ColumnNode wrapper since 4.0; `new Column(expr)` is gone).
  * Lives inside the org.apache.spark.sql package tree for access — the
  * standard extension-library technique (see SNIPPETS.md [1]/[2]); only
  * these two one-line forwarders live here, nothing else reaches into
  * Spark internals.
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
