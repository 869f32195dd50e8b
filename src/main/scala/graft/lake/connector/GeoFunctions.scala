package graft.lake.connector

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.Geo

/** Scalar geometry functions over the WKB BINARY carrier (reference: the
  * spatial extension surface the geo corpus uses — `ST_POINT`, WKT casts,
  * WKT rendering; reference src/types.rs:67-68 maps geometry to WKB).
  *
  * CodegenFallback is deliberate: these are catalog/DDL-adjacent
  * conversions, not hot-path operators — geometry-heavy pipelines operate
  * on the WKB bytes directly.
  */
case class StPoint(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_point"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    Geo.toWkb(Geo.Pt(1, hasZ = false, hasM = false,
      Array(x.asInstanceOf[Double], y.asInstanceOf[Double])))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StPoint =
    copy(left = newLeft, right = newRight)
}

case class StGeomFromText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_geomfromtext"
  override protected def nullSafeEval(wkt: Any): Any =
    Geo.wktToWkb(wkt.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(newChild: Expression): StGeomFromText =
    copy(child = newChild)
}

case class StAsText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "st_astext"
  override protected def nullSafeEval(wkb: Any): Any =
    Geo.wkbToWkt(wkb.asInstanceOf[Array[Byte]])
      .map(UTF8String.fromString).orNull
  override protected def withNewChildInternal(newChild: Expression): StAsText =
    copy(child = newChild)
}
