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

  /** Re-lift an InternalRow RDD as a DataFrame with a FRESH logical
    * plan (no lineage, default stats, no constraints). The unboxed twin
    * of `createDataFrame(df.rdd, schema)` for iterative loops that must
    * cut the Catalyst plan per round (see graft.ops.Dedup.freshen):
    * `Dataset.localCheckpoint` would bake the origin plan's
    * stats/constraints onto its LogicalRDD (squaring size estimates
    * under self-joins), and the public `df.rdd` path boxes every row.
    * Rows must already be safe to hold (copied) — `toRdd` reuses
    * UnsafeRow buffers, so callers map `_.copy()` before handing the
    * RDD over.
    */
  def internalFrame(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow])
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
