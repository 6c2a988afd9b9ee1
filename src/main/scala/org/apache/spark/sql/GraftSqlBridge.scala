package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` classic Column↔Expression converters
  * (Spark 4 moved Column onto ColumnNode; `classic.ExpressionUtils` is
  * the supported internal path for libraries registering custom
  * Catalyst expressions). Lives in the spark.sql package for access.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
