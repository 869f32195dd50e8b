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

  /** TIMESTAMP_NTZ truncated to a unit boundary (`unitMicros` = 1e6 for
    * seconds, 1e3 for millis) by pure integer arithmetic on the physical
    * micros. The r14 date_trunc formulation round-tripped the zone-less
    * value through the session-zone TIMESTAMP, which shifts wall times
    * inside a DST spring-forward gap by the gap width; floor division on
    * the physical value is zone-free (and truncates pre-epoch values
    * toward −∞, matching date_trunc's downward wall-time truncation).
    */
  def truncNtz(c: Column, unitMicros: Long): Column =
    column(TruncNtzMicros(expression(c), unitMicros))
}

/** Floor a TIMESTAMP_NTZ to a µs-unit boundary on its physical Long
  * micros — see [[RawTemporal.truncNtz]].
  */
case class TruncNtzMicros(child: Expression, unitMicros: Long)
    extends UnaryExpression {
  require(unitMicros > 0, "unit must be positive")

  override def prettyName: String = "trunc_ntz_micros"
  override def dataType: DataType = TimestampNTZType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == TimestampNTZType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a timestamp_ntz input")

  override def nullSafeEval(input: Any): Any =
    Math.floorDiv(input.asInstanceOf[Long], unitMicros) * unitMicros

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.lang.Math.floorDiv($c, ${unitMicros}L) * ${unitMicros}L;")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
