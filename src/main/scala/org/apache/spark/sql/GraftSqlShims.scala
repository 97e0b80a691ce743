package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 made `Column` carry a ColumnNode
  * rather than an Expression; the converter lives in
  * `org.apache.spark.sql.classic.ExpressionUtils` but is `private[sql]`,
  * so library code that builds custom aggregates from user-supplied
  * Columns (graft.plans.Reduce) needs this one-file shim — the standard
  * pattern for Spark extension libraries.
  */
object GraftSqlShims {
  /** Eager conversion: `ExpressionUtils.expression` returns a lazy
    * ColumnNodeExpression wrapper (whose `foldable`/shape can't be
    * inspected), so convert the node directly.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
