package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4's Column API is connect-agnostic and no longer exposes its
  * Catalyst expression publicly; the classic-mode accessors live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This shim, compiled inside the `org.apache.spark.sql`
  * package namespace, is the single sanctioned crossing point for
  * graft's custom Catalyst expressions.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column     = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
