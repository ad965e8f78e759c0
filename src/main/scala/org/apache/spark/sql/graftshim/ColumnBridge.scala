package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides the Expression ⇄ Column bridge behind
  * `private[sql] ExpressionUtils`; custom Catalyst expressions need it
  * to surface as `Column`s. Standard extension-library shim: live in a
  * `org.apache.spark.sql` subpackage to satisfy the access scope.
  * Public-API-equivalent in earlier Spark: `new Column(expr)`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
