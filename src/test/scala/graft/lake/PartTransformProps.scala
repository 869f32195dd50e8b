package graft.lake

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for partition-transform pruning safety: for any source
  * value v, the transform value the WRITERS would compute must land v
  * inside the range [[PartTransform.sourceRange]] inverts for the
  * READERS — otherwise a scan could skip a file that contains matches
  * (silent wrong results). Also: the executor-side row evaluator and the
  * pruning-side literal bucketing must agree with each other.
  */
object PartTransformProps extends Properties("PartTransform") {

  // ±200 years of epoch days / micros
  private val genDays: Gen[Int] = Gen.chooseNum(-73000, 73000)
  private val genMicros: Gen[Long] =
    Gen.chooseNum(-6311390400000000L, 6311390400000000L)

  private def within(dt: DataType, canon: Long, range: (String, String)): Boolean =
    range._1.toLong <= canon && canon <= range._2.toLong

  property("date value lies in the inverted range of its transform value") =
    forAll(genDays, Gen.oneOf("year", "month", "day")) { (days, t) =>
      val v = PartTransform.transformValue(t, DateType, days)
      PartTransform.sourceRange(t, DateType, v) match {
        case Some(r) => within(DateType, days.toLong, r)
        // cyclic ordinals (month=3 recurs every year) have no range
        // inverse; None keeps the file — conservative by construction
        case None => t == "month" || t == "day" || v.startsWith("-")
      }
    }

  property("timestamp value lies in the inverted range of its transform value") =
    forAll(genMicros, Gen.oneOf("year", "month", "day", "hour")) { (us, t) =>
      val v = PartTransform.transformValue(t, TimestampNTZType, us)
      PartTransform.sourceRange(t, TimestampNTZType, v) match {
        case Some(r) => within(TimestampNTZType, us, r)
        // cyclic ordinals never invert; pre-epoch years may not parse —
        // both acceptable only by KEEPING the file, which None does
        case None => t != "year" || v.startsWith("-")
      }
    }

  private val genStr: Gen[String] =
    Gen.choose(0, 8).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'z', '0')))

  property("string lies in the truncate-inverted range") =
    forAll(genStr, Gen.choose(1, 4)) { (s, k0) =>
      val k = math.max(k0, 1) // shrinker may step outside the Gen bounds
      val t = s"truncate[$k]"
      val v = PartTransform.transformValue(t, StringType, s)
      PartTransform.sourceRange(t, StringType, v) match {
        case Some((lo, hi)) => lo <= s && s <= hi
        // an empty prefix has no finite bound; keeping the file (no
        // range) is the conservative — and only correct — answer
        case None => v.isEmpty
      }
    }

  property("bucketOf(literal) equals the writer's bucket of the same value") =
    forAll(Gen.chooseNum(-100000L, 100000L), Gen.choose(1, 64)) { (v, n) =>
      val writer = PartTransform.transformValue(s"bucket[$n]", LongType, v).toInt
      PartTransform.bucketOf(java.lang.Long.valueOf(v), n).contains(writer)
    }

  property("parse/render round-trips every spec form") =
    forAll(Gen.oneOf("c", "year(c)", "month(c)", "day(c)", "hour(c)",
      "bucket(16, c)", "truncate(4, c)")) { spec =>
      PartTransform.parse(PartTransform.parse(spec).spec).spec ==
        PartTransform.parse(spec).spec
    }
}
