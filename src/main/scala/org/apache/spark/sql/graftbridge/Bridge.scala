package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor and made the
  * conversion utilities `private[sql]`; this bridge (inside the sql
  * package hierarchy, the standard extension escape hatch) exposes the two
  * conversions custom Catalyst expressions need to surface as Columns. */
object Bridge {
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
}
