package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native expressions.
  *
  * Spark 4 made the classic `Column(expr)` constructor and `Column.expr`
  * accessor `private[sql]` (the public surface now goes through ColumnNode).
  * Extension libraries that ship custom Catalyst expressions use a shim in a
  * `org.apache.spark.sql` subpackage to reach the sanctioned converters —
  * this is the entire contents of ours.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
