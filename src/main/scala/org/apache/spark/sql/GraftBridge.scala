package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's package-private Expression<->Column
  * conversions (org.apache.spark.sql.classic.ExpressionUtils), needed to
  * expose graft's custom Catalyst expressions through the public Column
  * API on Spark 4's unified Column. Lives in org.apache.spark.sql only to
  * satisfy the private[sql] access modifier; contains no logic.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
