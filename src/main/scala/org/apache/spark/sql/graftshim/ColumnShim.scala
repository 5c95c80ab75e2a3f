package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4 moved the Expression↔Column conversions behind
  * private[sql] (classic.ExpressionUtils); extension libraries reach
  * them from an org.apache.spark.sql subpackage — the established
  * pattern for third-party expression packages. */
object ColumnShim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
