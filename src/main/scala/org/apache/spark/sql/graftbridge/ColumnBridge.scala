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

  /** Column names referenced by an UNRESOLVED Column (predicates built
    * from `col(...)` trees). Spark 4's lazy ColumnNodeExpression hides
    * the tree from Catalyst's `collect`, so walk the ColumnNode graph.
    */
  def references(c: Column): Seq[String] = {
    import org.apache.spark.sql.internal._
    def walk(n: ColumnNode): Seq[String] = n match {
      case a: UnresolvedAttribute => Seq(a.nameParts.last)
      case f: UnresolvedFunction  => f.arguments.flatMap(walk)
      case c: Cast                => walk(c.child)
      case w: CaseWhenOtherwise =>
        w.branches.flatMap { case (a, b) => walk(a) ++ walk(b) } ++
          w.otherwise.toSeq.flatMap(walk)
      case _ => Nil
    }
    walk(c.node).distinct
  }
}
