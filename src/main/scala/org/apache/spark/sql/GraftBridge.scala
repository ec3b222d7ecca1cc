package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark 4's `private[sql]` Column↔Expression
  * converters, for registering custom Catalyst expressions as Columns.
  * (Spark ≤3 exposed `new Column(expr)`; Spark 4 routes Columns through
  * ColumnNode and hides the classic constructors.) */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
