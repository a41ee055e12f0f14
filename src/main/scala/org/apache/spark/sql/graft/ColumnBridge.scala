package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for the classic (non-Connect) runtime.
  *
  * Spark 4 made the Column/Expression conversion `private[sql]`
  * (`ExpressionUtils` in `columnNodeSupport.scala`); like other Catalyst
  * extension libraries, graft hosts this one-file shim inside the
  * `org.apache.spark.sql` namespace to reach it. Everything else in the
  * engine lives under `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
