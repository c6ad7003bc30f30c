package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's package-private Column <-> Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils). Spark 4 routes Column
  * through ColumnNode; these are the supported classic-session conversions,
  * just not public — hence this shim inside the org.apache.spark.sql package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
