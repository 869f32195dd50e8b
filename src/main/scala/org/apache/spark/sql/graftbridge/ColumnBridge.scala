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

  /** [[internalFrame]] that additionally DECLARES the RDD's physical hash
    * partitioning to Catalyst. For iterative loops whose per-round frames
    * were just shuffled onto their join keys (`repartition(col(k))` before
    * the RDD boundary), this lets EnsureRequirements skip re-exchanging
    * the frame in every subsequent round's joins — the plain bridge
    * reports UnknownPartitioning and pays the shuffle again. The caller
    * GUARANTEES the rows physically lie in `HashPartitioning(hashCols,
    * rdd.getNumPartitions)` layout (a row-preserving map over the
    * repartitioned toRdd keeps it); declaring a layout the rows don't
    * have silently mis-joins.
    */
  def internalFrameHashPartitioned(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      hashCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    val keys = hashCols.map(n => attrs.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no such column to hash-declare: $n")))
    val part = org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
      keys, rdd.getNumPartitions)
    org.apache.spark.sql.classic.Dataset.ofRows(session,
      new org.apache.spark.sql.execution.LogicalRDD(attrs, rdd, part, Nil,
        false, None)(session, None, None))
  }
}
