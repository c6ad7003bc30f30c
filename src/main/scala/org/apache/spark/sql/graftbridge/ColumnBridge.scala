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

  /** Spark's standard WRONG_NUM_ARGS analysis error — the same error class
    * built-in functions raise — for the SQL functions injected by
    * `graft.plans.GraftExtensions`. `QueryCompilationErrors` is
    * `private[sql]`, hence exposed through this bridge.
    */
  def wrongNumArgs(name: String, expected: Int, actual: Int): Throwable =
    org.apache.spark.sql.errors.QueryCompilationErrors
      .wrongNumArgsError(name, Seq(expected), actual)
}
