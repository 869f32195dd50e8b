package graft.lake

import org.apache.spark.sql.types._

/** DuckLake type-string ⇄ Spark SQL type bridge: alias normalization,
  * both mapping directions, and the append-evolution promotion lattice.
  * Port of the reference's type system (reference: src/types.rs:12-164
  * read direction, :95-164 write direction, :305-308 normalization,
  * :322-423 promotion).
  *
  * Documented deviations from the reference (SURVEY.md §1.3): Spark has no
  * unsigned ints (each uintN widens to the next signed type; uint64 →
  * decimal(20,0)), no TIME type (µs-of-day as long), and decimals cap at
  * precision 38 (p∈(38,76] is rejected at catalog load instead of mapping
  * to Decimal256).
  */
object TypeBridge {

  /** Canonical form of a DuckLake type string (lower-cased, aliases folded). */
  def normalize(t: String): String = {
    val s = t.trim.toLowerCase
    s match {
      case "bool" | "boolean"                  => "boolean"
      case "int8" | "tinyint"                  => "int8"
      case "int16" | "smallint" | "short"      => "int16"
      case "int32" | "int" | "integer"         => "int32"
      case "int64" | "bigint" | "long"         => "int64"
      case "uint8" | "utinyint"                => "uint8"
      case "uint16" | "usmallint"              => "uint16"
      case "uint32" | "uinteger"               => "uint32"
      case "uint64" | "ubigint"                => "uint64"
      case "float32" | "float" | "real"        => "float32"
      case "float64" | "double"                => "float64"
      case "varchar" | "text" | "string"       => "varchar"
      case "blob" | "binary" | "bytea"         => "blob"
      case "timestamp" | "datetime"            => "timestamp"
      case "timestamptz" | "timestamp with time zone" => "timestamptz"
      case other                               => other
    }
  }

  private val DecimalRe = """(?:decimal|numeric)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val ListRe = """(?:list|array)\s*<(.+)>""".r
  private val SqlArrayRe = """(.+)\[\]""".r

  /** DuckLake type string → Spark type. Throws [[UnsupportedTypeException]]
    * for struct/map (parity with reference src/types.rs:74-85) and for
    * invalid/oversized decimals (src/types.rs:167-251).
    */
  def toSpark(t: String): DataType = normalize(t) match {
    case "boolean"      => BooleanType
    case "int8"         => ByteType
    case "int16"        => ShortType
    case "int32"        => IntegerType
    case "int64"        => LongType
    case "uint8"        => ShortType          // widen: no unsigned in Spark
    case "uint16"       => IntegerType
    case "uint32"       => LongType
    case "uint64"       => DecimalType(20, 0)
    case "float32"      => FloatType
    case "float64"      => DoubleType
    case "date"         => DateType
    case "time"         => LongType           // µs of day; Spark has no TIME
    case "timetz"       => StringType
    case "timestamp"    => TimestampNTZType
    case "timestamptz"  => TimestampType
    case "timestamp_s" | "timestamp_ms" | "timestamp_ns" => TimestampNTZType
    case "interval"     => DayTimeIntervalType()
    case "varchar"      => StringType
    case "json"         => StringType
    case "blob"         => BinaryType
    case "uuid"         => BinaryType
    case s if s.startsWith("point") || s.startsWith("linestring") ||
      s.startsWith("polygon") || s.startsWith("multi") || s == "geometry" =>
      BinaryType                              // WKB, as in reference
    case DecimalRe(p, sc) =>
      val (prec, scale) = (p.toInt, sc.toInt)
      if (prec == 0 || prec > 76 || scale > prec)
        throw new UnsupportedTypeException(s"invalid decimal($prec,$scale)")
      if (prec > 38)
        throw new UnsupportedTypeException(
          s"decimal precision $prec exceeds Spark's max of 38 (reference maps to Decimal256)")
      DecimalType(prec, scale)
    case "decimal" | "numeric" => DecimalType(18, 3)
    case ListRe(elem) =>
      val e = normalize(elem)
      if (e.startsWith("list") || e.startsWith("array") || e.endsWith("[]"))
        throw new UnsupportedTypeException("nested list types are not supported")
      ArrayType(toSpark(elem), containsNull = true)
    case SqlArrayRe(elem) => toSpark(s"list<$elem>")
    case s if s.startsWith("struct") || s.startsWith("map") =>
      throw new UnsupportedTypeException(s"type not supported: $s")
    case other =>
      throw new UnsupportedTypeException(s"unknown DuckLake type: $other")
  }

  /** Spark type → DuckLake type string (write direction). */
  def fromSpark(dt: DataType): String = dt match {
    case BooleanType         => "boolean"
    case ByteType            => "int8"
    case ShortType           => "int16"
    case IntegerType         => "int32"
    case LongType            => "int64"
    case FloatType           => "float32"
    case DoubleType          => "float64"
    case DateType            => "date"
    case TimestampNTZType    => "timestamp"
    case TimestampType       => "timestamptz"
    case StringType          => "varchar"
    case BinaryType          => "blob"
    case d: DecimalType      => s"decimal(${d.precision},${d.scale})"
    case ArrayType(e, _)     => s"list<${fromSpark(e)}>"
    case _: DayTimeIntervalType | _: YearMonthIntervalType => "interval"
    case other =>
      throw new UnsupportedTypeException(s"cannot store Spark type $other in DuckLake")
  }

  private val intWidening = List("int8", "int16", "int32", "int64")
  private val uintWidening = List("uint8", "uint16", "uint32", "uint64")

  /** Append-mode evolution compatibility: can a column of type `from` be
    * promoted to `to`? (reference: src/types.rs:322-400 `is_promotable`).
    */
  def isPromotable(from: String, to: String): Boolean = {
    val (f, t) = (normalize(from), normalize(to))
    if (f == t) return true
    def chainOk(chain: List[String]): Boolean = {
      val (fi, ti) = (chain.indexOf(f), chain.indexOf(t))
      fi >= 0 && ti >= 0 && fi < ti
    }
    val intToFloat64 = (intWidening.contains(f) || uintWidening.contains(f)) && t == "float64"
    val floatWiden = f == "float32" && t == "float64"
    val tsToTz = f == "timestamp" && t == "timestamptz"
    val decimalWiden = (f, t) match {
      case (DecimalRe(p1, s1), DecimalRe(p2, s2)) =>
        val (ip1, ip2) = (p1.toInt - s1.toInt, p2.toInt - s2.toInt)
        ip2 >= ip1 && s2.toInt >= s1.toInt
      case _ => false
    }
    chainOk(intWidening) || chainOk(uintWidening) ||
      intToFloat64 || floatWiden || tsToTz || decimalWiden
  }

  /** Whether two types are identical after normalization or promotable
    * (reference: src/types.rs:406-423 `types_compatible`).
    */
  def typesCompatible(from: String, to: String): Boolean =
    normalize(from) == normalize(to) || isPromotable(from, to)
}
