package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the sql package: Column <-> Expression conversion is
  * private[sql] in Spark 4 (classic.ExpressionUtils), and wrapping a custom
  * Catalyst Expression as a Column is the supported extension surface
  * everywhere else (SparkSessionExtensions rules receive Expressions the
  * same way). This is the only file outside the graft namespace.
  */
object GraftBridge {
  def column(e: Expression): Column     = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
