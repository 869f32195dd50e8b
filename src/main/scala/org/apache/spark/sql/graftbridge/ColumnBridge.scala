package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. Spark 4 wraps Columns in
  * ColumnNodes with the converters `private[sql]`, so libraries adding
  * native Catalyst expressions (see graft.functions.VectorExpressions)
  * need this one-file shim inside the `org.apache.spark.sql` namespace —
  * the established pattern for Catalyst-extending libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
