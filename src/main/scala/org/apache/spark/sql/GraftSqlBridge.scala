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

  /** RECURSIVE ColumnNode→catalyst conversion. `expression` above
    * wraps the node in an opaque `ColumnNodeExpression` that reports
    * resolved while hiding unresolved children — fine when Dataset
    * analysis converts it, fatal inside a FunctionRegistry builder
    * (codegen meets the wrapper raw). This walks the node into real
    * catalyst expressions (builtins become `UnresolvedFunction`s the
    * analyzer then resolves normally). */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
