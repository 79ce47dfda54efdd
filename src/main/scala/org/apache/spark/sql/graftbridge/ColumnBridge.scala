package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 moved the classic `Column(expr)` /
  * `col.expr` surface behind `private[sql]` (columnNodeSupport.scala), so
  * custom Catalyst expressions need this one-hop in the sql namespace —
  * the standard extension-library technique.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
