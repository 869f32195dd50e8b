package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot loops.
  *
  * The `zip_with`/`aggregate` higher-order-function formulation is
  * CodegenFallback — every row pays interpreted lambda dispatch per
  * element, the dominant cost of brute-force and LSH similarity at scale.
  * These expressions run the same left-to-right double accumulation
  * (bit-identical results) as ONE fused whole-stage-codegen loop, no
  * intermediate product array. This is the SURVEY §4.2 case for custom
  * Catalyst work: semantics Spark's built-ins express only via
  * interpreted HOFs.
  */
abstract class VectorFold extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def getElem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** java source for element `i` (a generated variable name) of `v`. */
  protected def getterJava(v: String, isFloat: Boolean, i: String): String =
    if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"

  /** Combine (dot, normA, normB) accumulators into the result. */
  protected def finish(dot: Double, na: Double, nb: Double): Double
  protected def finishJava(dot: String, na: String, nb: String): String

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = getElem(a, i, fa)
      val y = getElem(b, i, fb)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    finish(dot, na, nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      // every local must be freshName'd: a literal `i` collides when two
      // vector folds land in one codegen scope (janino then rejects the
      // whole stage and Spark falls back to interpreted execution)
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = ${getterJava(a, fa, i)};
         |    final double $y = ${getterJava(b, fb, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = ${finishJava(dot, na, nb)};
         |  }
         |}
       """.stripMargin
    })
  }
}

/** Σ aᵢ·bᵢ (left-to-right double accumulation). */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vec_dot"
  override protected def finish(dot: Double, na: Double, nb: Double): Double = dot
  override protected def finishJava(dot: String, na: String, nb: String): String = dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a,b) / (‖a‖·‖b‖), all three folds fused into one pass. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vec_cosine"
  override protected def finish(dot: Double, na: Double, nb: Double): Double =
    dot / (math.sqrt(na) * math.sqrt(nb))
  override protected def finishJava(dot: String, na: String, nb: String): String =
    s"$dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Morton (Z-order) interleave of two 16-bit normalized coordinates:
  * bit i of `left` lands at position 2i, bit i of `right` at 2i+1. Rows
  * sorted by the result cluster in BOTH dimensions, so min/max file
  * skipping prunes on either column — the multi-dimensional layout
  * single-column sorting can't give.
  */
case class InterleaveBits16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "zorder16"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires int inputs (16-bit normalized coordinates)")

  private def interleave(a: Int, b: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < 16; $i++) {
         |  $z |= (long) (($a >> $i) & 1) << (2 * $i);
         |  $z |= (long) (($b >> $i) & 1) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Column-level entry points (used by [[graft.ops.Similarity]]). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vecCosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def zorder16(a: Column, b: Column): Column =
    ColumnBridge.column(InterleaveBits16(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
