package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst-Expression bridge for custom expressions (Spark 4
  * made `Column.expr`/`new Column(expr)` private behind
  * `classic.ExpressionUtils`, which is `private[sql]` — the standard
  * extension-point idiom is a same-package accessor). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
