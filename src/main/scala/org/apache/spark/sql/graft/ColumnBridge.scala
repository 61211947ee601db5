package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Expression<->Column conversion
  * (org.apache.spark.sql.classic.ExpressionUtils, Spark 4.x classic API).
  * Needed to expose custom Catalyst expressions (e.g. graft.functions.EwmAvg)
  * through the public Column API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
