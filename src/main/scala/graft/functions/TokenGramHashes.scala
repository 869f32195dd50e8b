package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass w-gram hash array over an (already lowercased) string:
  * tokens are the maximal `[a-z0-9]+` byte runs, each hashed with
  * xxhash64 (seed 42, Spark's); gram i combines token hashes
  * i..i+w-1 left-to-right with `xxhash64(acc, next)`. Bit-exact with
  * the composed column pipeline it replaces —
  * `transform(filter(split(lower(text), "[^a-z0-9]+"), _ =!= ""),
  * xxhash64)` fed through [[graft.ops.Dedup.gramHashes]] — including
  * the short-document branch (fewer than w tokens fold into ONE gram
  * seeded at 42; a token-less document yields `[42]`, the fold's
  * initial value). Byte-wise tokenization is exact: every byte of a
  * multi-byte UTF-8 code point has the high bit set, so it can never
  * be part of (or glue together) an ASCII alphanumeric run — the same
  * argument as [[TextStats]].
  *
  * The HOF formulation evaluates `split` (regex engine + per-token
  * UTF8String allocation), a `filter` and a `transform` lambda per
  * token, and w−1 interpreted `zip_with` passes per document; this is
  * one allocation-light byte scan plus fixed-width XXH64 mixes, inside
  * whole-stage codegen — the minhash sketch and Jaccard-verify paths
  * are dominated by exactly this work.
  *
  * Null semantics (r12 ADVICE, pinned in OpsSpec): NULL text yields a
  * NULL gram array — identical to the HOF formulation under Spark 4's
  * `size(null) = null` — and downstream candidate generation drops the
  * row at `explode`. Intentional: a null document belongs to no bucket.
  */
case class TokenGramHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "gram width must be at least 1")

  override def prettyName: String = "token_gram_hashes"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")

  override def nullSafeEval(input: Any): Any =
    TokenGramHashes.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokenGramHashes.compute($s, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenGramHashes {
  private final val Seed = 42L

  /** xxhash64(a, b) as Spark computes it for two long arguments. */
  private def combine(a: Long, b: Long): Long =
    XXH64.hashLong(b, XXH64.hashLong(a, Seed))

  /** See [[TokenGramHashes]]; public because generated code calls it. */
  def compute(s: UTF8String, w: Int): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    // pass 1: token hashes (one XXH64 over each token's byte range —
    // identical to xxhash64 over the token as its own UTF8String)
    var th = new Array[Long](math.max(8, math.min(64, n / 4)))
    var nt = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        val start = i
        i += 1
        while (i < n && {
          val c = s.getByte(i); (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) i += 1
        if (nt == th.length) th = java.util.Arrays.copyOf(th, th.length * 2)
        th(nt) = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        nt += 1
      } else i += 1
    }
    // short document: every token hash folds into one gram, starting
    // from the fold's initial value 42 (so zero tokens yield [42])
    if (nt < w) {
      var acc = Seed
      var k = 0
      while (k < nt) { acc = combine(acc, th(k)); k += 1 }
      return new GenericArrayData(Array(acc))
    }
    val m = nt - w + 1
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      var acc = th(g)
      var k = 1
      while (k < w) { acc = combine(acc, th(g + k)); k += 1 }
      out(g) = acc
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: w-gram hashes of a text column (lowercased here,
    * so callers pass the raw text).
    */
  def tokenGramHashes(text: Column, w: Int = 3): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      TokenGramHashes(org.apache.spark.sql.graftbridge.ColumnBridge.expression(
        org.apache.spark.sql.functions.lower(text)), w))
}
