package graft.lake

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property test for the file-skipping oracle: [[FileStats.mightMatch]]
  * must be CONSERVATIVE — whenever it prunes a file (returns false), no
  * row of that file can satisfy the filter. Violations are silent wrong
  * results at scale, so this is the one invariant worth fuzzing.
  */
object FileStatsProps extends Properties("FileStats.mightMatch") {

  private val schema = StructType(Seq(
    StructField("x", LongType), StructField("s", StringType)))

  // file contents: longs (with nulls) + short strings (with nulls)
  private val genLongs: Gen[List[Option[Long]]] =
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.const(None), Gen.chooseNum(-50L, 50L).map(Some(_))))
  private val genStr: Gen[String] =
    Gen.choose(0, 3).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  private val genStrs: Gen[List[Option[String]]] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.const(None), genStr.map(Some(_))))

  /** Build the stats map the way the write path would. */
  private def longStats(vals: List[Option[Long]]) = {
    val nn = vals.flatten
    val nulls = Some(vals.count(_.isEmpty).toLong)
    if (nn.isEmpty) (nulls, None, None)
    else (nulls, Some(nn.min.toString), Some(nn.max.toString))
  }
  private def strStats(vals: List[Option[String]]) = {
    val nn = vals.flatten
    val nulls = Some(vals.count(_.isEmpty).toLong)
    if (nn.isEmpty) (nulls, None, None)
    else (nulls, Some(nn.min), Some(nn.max))
  }

  private val genLongFilter: Gen[(Filter, Option[Long] => Boolean)] = for {
    v <- Gen.chooseNum(-55L, 55L)
    vs <- Gen.nonEmptyListOf(Gen.chooseNum(-55L, 55L))
    (f, p) <- Gen.oneOf[(Filter, Option[Long] => Boolean)](
      (EqualTo("x", v), (o: Option[Long]) => o.contains(v)),
      (GreaterThan("x", v), (o: Option[Long]) => o.exists(_ > v)),
      (GreaterThanOrEqual("x", v), (o: Option[Long]) => o.exists(_ >= v)),
      (LessThan("x", v), (o: Option[Long]) => o.exists(_ < v)),
      (LessThanOrEqual("x", v), (o: Option[Long]) => o.exists(_ <= v)),
      (In("x", vs.map(Long.box).toArray), (o: Option[Long]) => o.exists(vs.contains)),
      (EqualNullSafe("x", v), (o: Option[Long]) => o.contains(v)),
      (EqualNullSafe("x", null), (o: Option[Long]) => o.isEmpty),
      (IsNull("x"), (o: Option[Long]) => o.isEmpty),
      (IsNotNull("x"), (o: Option[Long]) => o.isDefined))
  } yield (f, p)

  property("never prunes a long row that matches") =
    forAll(genLongs, genLongFilter) { case (vals, (filter, pred)) =>
      val stats = Map("x" -> longStats(vals))
      val kept = FileStats.mightMatch(filter, schema, vals.size.toLong, stats)
      kept || !vals.exists(pred)
    }

  private val genStrFilter: Gen[(Filter, Option[String] => Boolean)] = for {
    v <- genStr
    (f, p) <- Gen.oneOf[(Filter, Option[String] => Boolean)](
      (EqualTo("s", v), (o: Option[String]) => o.contains(v)),
      (GreaterThan("s", v), (o: Option[String]) => o.exists(_ > v)),
      (LessThan("s", v), (o: Option[String]) => o.exists(_ < v)),
      (StringStartsWith("s", v), (o: Option[String]) => o.exists(_.startsWith(v))),
      (IsNull("s"), (o: Option[String]) => o.isEmpty))
  } yield (f, p)

  property("never prunes a string row that matches") =
    forAll(genStrs, genStrFilter) { case (vals, (filter, pred)) =>
      val stats = Map("s" -> strStats(vals))
      val kept = FileStats.mightMatch(filter, schema, vals.size.toLong, stats)
      kept || !vals.exists(pred)
    }

  property("And/Or compose conservatively") =
    forAll(genLongs, genLongFilter, genLongFilter) {
      case (vals, (f1, p1), (f2, p2)) =>
        val stats = Map("x" -> longStats(vals))
        val n = vals.size.toLong
        val andKept = FileStats.mightMatch(And(f1, f2), schema, n, stats)
        val orKept = FileStats.mightMatch(Or(f1, f2), schema, n, stats)
        (andKept || !vals.exists(v => p1(v) && p2(v))) &&
          (orKept || !vals.exists(v => p1(v) || p2(v)))
    }

  property("unknown stats always keep the file") =
    forAll(genLongFilter) { case (filter, _) =>
      FileStats.mightMatch(filter, schema, 100L,
        Map("x" -> ((None: Option[Long]), (None: Option[String]), (None: Option[String]))))
    }
}
