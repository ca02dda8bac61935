package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 wraps Column around ColumnNode
  * (the Connect-compatible representation) and gates the classic
  * converters behind `private[sql]` — the standard way for a library
  * shipping native Catalyst expressions to reach them is a bridge object
  * in the `org.apache.spark.sql` namespace (same approach as every
  * open-source Spark extension that predates a public API for this). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
