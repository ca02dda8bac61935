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

  /** Tag a column as nullable (Catalyst KnownNullable): a pure
    * pass-through at execution, but it stops static non-nullability
    * proofs that interact badly with subexpression elimination. The
    * known case: ElementAt over an inline CreateArray of non-nullable
    * elements with a foldable ordinal is proved non-nullable, yet its
    * generated code still assigns the out-of-bounds isNull variable —
    * under CSE that variable is never declared and Janino rejects the
    * whole class ("is not an rvalue"), silently dropping the projection
    * to interpreted execution. */
  def knownNullable(c: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.KnownNullable(expression(c)))
}
