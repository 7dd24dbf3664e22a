package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column ↔ Expression conversion (the Connect
  * refactor made `Column` wrap a ColumnNode); the supported conversion
  * lives in `private[sql]` ExpressionUtils. This bridge re-exports just
  * that pair for graft's custom Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
