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

  /** Eagerly convert a Column's node tree into a genuine catalyst
    * expression (Unresolved* nodes the analyzer then resolves in place).
    * [[expression]] instead wraps the node LAZILY — fine as an analyzer
    * input, but a lazily-wrapped node returned from an injected SQL
    * function stays `Unevaluable` at codegen. Use this for
    * SessionExtensions function builders that compose Column
    * combinators. */
  def convert(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
