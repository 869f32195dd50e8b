package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document SimHash-64 in one byte scan: tokens are the maximal
  * `[a-z0-9]+` runs of the (already lowercased) input, each occurrence's
  * xxhash64 (seed 42, Spark's) votes ±1 on all 64 bits, and the
  * fingerprint sets bit b iff the aggregate vote is positive. Bit-exact
  * with the explode → 64-conditional-sums → groupBy formulation in
  * [[graft.ops.Dedup.simhash64]]'s original shape (integer vote adds
  * commute, so aggregation order is irrelevant) — pinned by an equality
  * spec — but MAP-ONLY: the fingerprint of a document never leaves its
  * scan task, where the exploded shape paid one row per token occurrence
  * into a 64-column partial aggregate and a per-document shuffle.
  * Frequency weighting is preserved: occurrences vote, not the distinct
  * token set.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash64"

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.SimHash64.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  private final val Seed = 42L

  /** See [[SimHash64]]; public because generated code calls it. */
  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    val votes = new Array[Int](64)
    var nTokens = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        val start = i
        i += 1
        while (i < n && {
          val c = s.getByte(i); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) i += 1
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
        nTokens += 1
      } else i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) fp |= 1L << bit
      bit += 1
    }
    fp
  }

  /** Column wrapper: SimHash-64 fingerprint of a text column
    * (lowercased here, so callers pass the raw text).
    */
  def simhash64(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SimHash64(org.apache.spark.sql.graftbridge.ColumnBridge.expression(
        org.apache.spark.sql.functions.lower(text))))
}
