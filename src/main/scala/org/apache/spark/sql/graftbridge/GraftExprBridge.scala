package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression conversion for custom native expressions.
  * `ExpressionUtils` is `private[sql]`, so this one-file bridge lives inside
  * the `org.apache.spark.sql` package tree — the standard technique for
  * Spark extensions that add codegen expressions without a fork. */
object GraftExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
