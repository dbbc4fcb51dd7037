package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters.
  *
  * Spark 4 moved `Column` to a connect-agnostic representation
  * (`ColumnNode`); wrapping a raw Catalyst `Expression` now goes through
  * `classic.ExpressionUtils`, which is package-private. Living inside the
  * `org.apache.spark.sql` namespace is the standard pattern third-party
  * extensions use to reach it (same access scope as Spark's own
  * `Dataset` internals — public Spark source, no private APIs copied).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
