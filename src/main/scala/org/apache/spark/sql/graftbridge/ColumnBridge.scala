package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 made the conversions
  * (`ExpressionUtils.column`/`expression`) `private[sql]` during the
  * Connect refactor; a library defining its own native expressions needs
  * exactly these two calls, so this object re-exposes them from inside
  * the `org.apache.spark.sql` namespace — the conventional extension
  * point (no Spark internals are modified or shadowed).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
