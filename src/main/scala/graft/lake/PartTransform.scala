package graft.lake

import java.time.{LocalDate, YearMonth}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One partition key of a table: a source column plus an optional
  * transform. Rendered specs are what users write in `partitionBy`:
  * `"o_orderdate"` (identity hive partitioning), `"year(o_orderdate)"`,
  * `"month(ts)"`, `"day(ts)"`, `"bucket(16, l_orderkey)"`,
  * `"truncate(4, c_name)"`.
  */
final case class PartField(source: String, transform: Option[String]) {
  def spec: String = transform match {
    case None                => source
    case Some(PartTransform.BucketRe(n))   => s"bucket($n, $source)"
    case Some(PartTransform.TruncateRe(n)) => s"truncate($n, $source)"
    case Some(t)             => s"$t($source)"
  }
}

/** Partition transforms over the hive layout (DuckLake spec:
  * `ducklake_partition_column` carries a transform per key; the reference
  * has no partition support at all — README.md "Known Limitations").
  * The transform VALUE is what lands in the directory name and in
  * `ducklake_file_partition_value`; the SOURCE column stays physically in
  * the parquet (unlike identity partitioning, which moves it into the
  * directory). Pruning inverts each file's transform value into a
  * min/max range (time truncations, string truncate) or a bucket-equality
  * check on the source column — at 100 TB, `month(ts)` partitioning plus
  * a time-range predicate is the canonical "touch 2 of 1200 months" scan.
  *
  * Canonical transform encodings (stored in the catalog): `year`,
  * `month`, `day`, `bucket[n]`, `truncate[n]`.
  */
object PartTransform {

  private[lake] val BucketRe = """bucket\[(\d+)\]""".r
  private[lake] val TruncateRe = """truncate\[(\d+)\]""".r
  private val SpecFn = """(\w+)\s*\(\s*([^(),\s]+)\s*\)""".r
  private val SpecFn2 = """(\w+)\s*\(\s*(\d+)\s*,\s*([^(),\s]+)\s*\)""".r

  /** Parse a user partition spec string into a [[PartField]]. */
  def parse(spec: String): PartField = spec.trim match {
    case SpecFn2("bucket", n, c)   => PartField(c, Some(s"bucket[$n]"))
    case SpecFn2("truncate", n, c) => PartField(c, Some(s"truncate[$n]"))
    case SpecFn(t @ ("year" | "month" | "day" | "hour"), c) => PartField(c, Some(t))
    case SpecFn(other, _) =>
      throw new UnsupportedException(s"unknown partition transform: $other")
    case plain => PartField(plain, None)
  }

  /** Validate `t` against the source column's type; throws on mismatch so
    * a bad spec fails the CREATE, never a later scan.
    */
  def validate(t: String, dt: DataType, source: String): Unit = {
    val ok = t match {
      case "hour" => dt == TimestampType || dt == TimestampNTZType
      case "year" | "month" | "day" =>
        dt == DateType || dt == TimestampType || dt == TimestampNTZType
      case TruncateRe(_) => dt == StringType
      case BucketRe(_) =>
        dt == StringType || dt == LongType || dt == IntegerType ||
          dt == ShortType || dt == ByteType
      case _ => false
    }
    if (!ok) throw new UnsupportedException(
      s"partition transform $t not supported on ${dt.simpleString} column $source")
  }

  /** The Spark expression computing the transform VALUE (the hive
    * directory segment) from the source column. Null source → null value
    * (hive default partition), so all-null pruning stays uniform with
    * identity partitioning.
    */
  def valueExpr(t: String, c: Column): Column = t match {
    // DuckDB scalar semantics: year(ts)=2020, month(ts)=1..12,
    // day(ts)=1..31, hour(ts)=0..23 (corpus: partitioning/year_month_day
    // .test expects `year=2020/month=1` directories). The cyclic values
    // don't invert to a source range — pruning rides the source column's
    // own footer stats instead, which every write captures.
    case "year"  => date_format(c, "yyyy")
    case "month" => date_format(c, "M")
    case "day"   => date_format(c, "d")
    case "hour"  => date_format(c, "H")
    case TruncateRe(n) => substring(c, 1, n.toInt)
    case BucketRe(n) =>
      // md5-derived bucket: engine-portable (any side can recompute it
      // from the string form of the value), stable across runs/retries
      pmod(conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long"),
        lit(n.toInt)).cast("int").cast("string")
    case other => throw new UnsupportedException(s"unknown transform: $other")
  }

  /** Invert a file's transform value into the source column's canonical
    * [min, max] range (FileStats stats-string encoding: epoch days for
    * dates, epoch micros for timestamps, raw strings) — None when the
    * transform has no range inverse (bucket) or the value doesn't parse
    * (keep the file).
    */
  def sourceRange(t: String, dt: DataType, raw: String): Option[(String, String)] =
    try {
      def dateRange(lo: LocalDate, hiExcl: LocalDate): Option[(String, String)] = dt match {
        case DateType =>
          Some((lo.toEpochDay.toString, (hiExcl.toEpochDay - 1).toString))
        case TimestampType | TimestampNTZType =>
          val loUs = lo.toEpochDay * 86400000000L
          val hiUs = hiExcl.toEpochDay * 86400000000L - 1
          Some((loUs.toString, hiUs.toString))
        case _ => None
      }
      t match {
        case "year" =>
          val y = raw.toInt
          dateRange(LocalDate.of(y, 1, 1), LocalDate.of(y + 1, 1, 1))
        // month/day/hour are CYCLIC ordinals (month=3 recurs every year):
        // no source range exists — None keeps the file, and the source
        // column's footer stats do the actual pruning
        case TruncateRe(_) if dt == StringType =>
          incrementString(raw).map(hi => (raw, hi))
        case _ => None
      }
    } catch { case _: RuntimeException => None }

  /** Smallest string X such that every string with prefix `s` is < X:
    * increment the last non-￿ char and drop the tail. None when all
    * chars are ￿ (no finite bound → no pruning).
    */
  private def incrementString(s: String): Option[String] = {
    var i = s.length - 1
    while (i >= 0 && s.charAt(i) == '￿') i -= 1
    if (i < 0) None
    else Some(s.substring(0, i) + (s.charAt(i) + 1).toChar)
  }

  private def md5Bucket(s: String, n: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) % n).toInt
  }

  /** The bucket a FILTER LITERAL falls into, mirroring [[valueExpr]]'s
    * bucket expression exactly (md5 of Spark's `cast(c as string)` form).
    * None for types whose string form we don't reproduce → no pruning.
    */
  def bucketOf(v: Any, n: Int): Option[Int] = {
    val s = v match {
      case null => return None
      case s: String => s
      case b: java.lang.Byte => b.toString
      case x: java.lang.Short => x.toString
      case i: java.lang.Integer => i.toString
      case l: java.lang.Long => l.toString
      case _ => return None
    }
    Some(md5Bucket(s, n))
  }

  /** Transform value from a CATALYST row value (Int epoch days, Long
    * epoch micros, UTF8String, integral) — the executor-side counterpart
    * of [[valueExpr]], used by the native delta/streaming writers. Must
    * produce the same directory value as the SQL expression.
    */
  def transformValue(t: String, dt: DataType, v: Any): String = t match {
    case "year" | "month" | "day" | "hour" =>
      val d: java.time.LocalDateTime = dt match {
        case DateType =>
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).atStartOfDay()
        case TimestampType | TimestampNTZType =>
          val us = v.asInstanceOf[Long]
          java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
        case other => throw new UnsupportedTypeException(
          s"transform $t on ${other.simpleString}")
      }
      t match {
        case "year"  => f"${d.getYear}%04d"
        case "month" => d.getMonthValue.toString
        case "day"   => d.getDayOfMonth.toString
        case _       => d.getHour.toString
      }
    case TruncateRe(n) =>
      val s = v.toString
      s.substring(0, math.min(n.toInt, s.length))
    case BucketRe(n) => md5Bucket(v.toString, n.toInt).toString
    case other => throw new UnsupportedException(s"unknown transform: $other")
  }

  /** Conservative bucket pruning: false ⇒ no row of a file whose source
    * column hashes entirely to bucket `b` can match `filter`. Only
    * equality-shaped predicates on `attr` constrain a hash bucket.
    */
  def mightMatchBucket(filter: org.apache.spark.sql.sources.Filter,
      attr: String, n: Int, b: Int): Boolean = {
    import org.apache.spark.sql.sources._
    filter match {
      case EqualTo(a, v) if a == attr => bucketOf(v, n).forall(_ == b)
      case EqualNullSafe(a, v) if a == attr && v != null =>
        bucketOf(v, n).forall(_ == b)
      case In(a, vs) if a == attr =>
        vs.exists(v => v != null && bucketOf(v, n).forall(_ == b))
      case And(l, r) => mightMatchBucket(l, attr, n, b) && mightMatchBucket(r, attr, n, b)
      case Or(l, r)  => mightMatchBucket(l, attr, n, b) || mightMatchBucket(r, attr, n, b)
      case _ => true
    }
  }
}
