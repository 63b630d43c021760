package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported bridge (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * private[sql]. This shim re-exports the two conversions for graft's
  * custom Catalyst expressions — the standard pattern used by Spark
  * extension libraries that ship native expressions.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
