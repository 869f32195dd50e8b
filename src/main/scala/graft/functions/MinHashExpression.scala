package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused MinHash+LSH banding over a document's gram-hash array:
  * `array<long>` of `bands` bucket keys, where bucket b combines the
  * minima of hash functions [b*r, (b+1)*r) and hash function i is a
  * splitmix64 finalizer over `gram ^ seed_i`.
  *
  * This replaces the explode → 4.5M-row shuffle → numHashes-column
  * min-aggregate pipeline shape with one whole-stage-codegen loop per
  * row: the shuffle drops from one row per (doc, gram) to `bands` narrow
  * rows per doc, and the numHashes derivations become raw Java long
  * mixes (no per-derivation expression dispatch, no ANSI overflow
  * concerns — generated Java wraps, Catalyst arithmetic would throw).
  * Same MinHash math, so LSH recall/precision guarantees carry over
  * (asserted in OpsSpec against the planted near-duplicate corpus).
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
  extends UnaryExpression {

  require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
    "numHashes must be a positive multiple of bands")

  override def prettyName: String = "minhash_bands"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> gram hashes, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var g = 0
    while (g < n) {
      if (!arr.isNullAt(g)) {
        val gh = arr.getLong(g)
        var i = 0
        while (i < numHashes) {
          val v = MinHashBands.smix(gh ^ (MinHashBands.SeedStep * (i + 1)))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      g += 1
    }
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = MinHashBands.SeedStep * (b + 1)
      var j = b * r
      while (j < (b + 1) * r) { h = MinHashBands.smix(h ^ mins(j)); j += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      val g = ctx.freshName("g")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val gh = ctx.freshName("gh")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val r = numHashes / bands
      val cls = classOf[MinHashBands].getName
      s"""
         |final int $n = $c.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $g = 0; $g < $n; $g++) {
         |  if (!$c.isNullAt($g)) {
         |    final long $gh = $c.getLong($g);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      final long $v = $cls.smix($gh ^ (${MinHashBands.SeedStep}L * ($i + 1)));
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |}
         |final long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = ${MinHashBands.SeedStep}L * ($b + 1);
         |  for (int $j = $b * $r; $j < ($b + 1) * $r; $j++) {
         |    $h = $cls.smix($h ^ $mins[$j]);
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBands {

  /** Odd golden-ratio step separating the per-function seeds. */
  final val SeedStep: Long = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer — the standard full-avalanche 64-bit mix. */
  def smix(x0: Long): Long = {
    var z = x0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Column wrapper over an `array<long>` gram-hash column. */
  def minhashBands(grams: Column, numHashes: Int, bands: Int): Column =
    ColumnBridge.column(MinHashBands(ColumnBridge.expression(grams), numHashes, bands))
}
