package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Expression converters.
  *
  * Spark 4.x moved the Column(expr) constructor behind the Connect/Classic
  * split; libraries that define custom Catalyst expressions use a small
  * package-injection shim like this one (same pattern as Delta/Iceberg
  * runtimes use for their expression surfaces).
  */
object GraftInternal {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
