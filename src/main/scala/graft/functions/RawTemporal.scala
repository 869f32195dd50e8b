package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Rescales a raw INT64 temporal value read from a foreign parquet file
  * into a Spark temporal: the lake scan reads TIME(MICROS) and
  * TIMESTAMP(NANOS) columns — which Spark's parquet reader refuses or
  * cannot represent — with an explicit BIGINT read schema, then this
  * expression reinterprets the long as the target type with one integer
  * rescale (floor division, so pre-epoch nanos truncate toward −∞ like
  * the reference's ns→µs conversion, src/types.rs:53-55):
  *  - µs-of-day → TimeType(6): ×1000 (Spark's time physical is
  *    nanos-of-day);
  *  - ns-since-epoch → TimestampNTZ: ÷1000 (physical micros).
  * Codegen-friendly: one multiply/divide inside whole-stage codegen.
  */
case class RawTemporal(child: Expression, targetType: DataType,
    num: Long, den: Long) extends UnaryExpression {
  require(num > 0 && den > 0, "scale factors must be positive")

  override def prettyName: String = "raw_temporal"
  override def dataType: DataType = targetType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input")

  override def nullSafeEval(input: Any): Any =
    Math.floorDiv(input.asInstanceOf[Long] * num, den)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.lang.Math.floorDiv($c * ${num}L, ${den}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RawTemporal {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** µs-of-day long column → TIME (precision 6). */
  def microsOfDayToTime(c: Column): Column =
    column(RawTemporal(expression(c), TimeType(6), 1000L, 1L))

  /** ns-since-epoch long column → TIMESTAMP_NTZ (µs floor-truncation). */
  def nanosToTimestampNtz(c: Column): Column =
    column(RawTemporal(expression(c), TimestampNTZType, 1L, 1000L))
}
