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

  /** DuckLake type string → Spark type. Nested struct/map parse from the
    * RAW string (normalization would lowercase field names); scalar types
    * go through alias normalization. Throws [[UnsupportedTypeException]]
    * for invalid/oversized decimals (src/types.rs:167-251).
    */
  /** The geometry type family (WKB-carried; reference src/types.rs:67-68). */
  def isGeometry(t0: String): Boolean = {
    val s = t0.toLowerCase
    s == "geometry" || s.startsWith("point") || s.startsWith("linestring") ||
      s.startsWith("polygon") || s.startsWith("multi")
  }

  def toSpark(t: String): DataType = {
    val raw = t.trim
    val lower = raw.toLowerCase
    if (lower.startsWith("struct<") && raw.endsWith(">"))
      return StructType(splitTop(raw.substring(raw.indexOf('<') + 1, raw.length - 1)).map { f =>
        val i = f.indexOf(':')
        if (i < 1) throw new UnsupportedTypeException(s"bad struct field: $f")
        StructField(f.substring(0, i).trim, toSpark(f.substring(i + 1)), nullable = true)
      })
    if (lower.startsWith("map<") && raw.endsWith(">"))
      return splitTop(raw.substring(raw.indexOf('<') + 1, raw.length - 1)) match {
        case Seq(k, v) => MapType(toSpark(k), toSpark(v), valueContainsNull = true)
        case _ => throw new UnsupportedTypeException(s"bad map type: $raw")
      }
    if (lower.startsWith("list<") || lower.startsWith("array<"))
      return ArrayType(toSpark(raw.substring(raw.indexOf('<') + 1, raw.length - 1)),
        containsNull = true)
    if (raw.endsWith("[]"))
      return ArrayType(toSpark(raw.dropRight(2)), containsNull = true)
    toSparkScalar(raw)
  }

  private def toSparkScalar(t: String): DataType = normalize(t) match {
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
    case "time"         => TimeType(6)        // µs-precision time of day
    case "timetz"       => StringType
    case "timestamp"    => TimestampNTZType
    case "timestamptz"  => TimestampType
    case "timestamp_s" | "timestamp_ms" | "timestamp_ns" => TimestampNTZType
    case "interval"     => DayTimeIntervalType()
    case "varchar"      => StringType
    case "json"         => StringType
    case "blob"         => BinaryType
    case "uuid"         => BinaryType
    case s if isGeometry(s) =>
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
    case other =>
      throw new UnsupportedTypeException(s"unknown DuckLake type: $other")
  }

  /** Immediate child nodes of a nested type under the DuckLake column
    * model: a list's `element`, a struct's fields, a map's `key`/`value`.
    * Primitives have none.
    */
  private def childNodes(t: String): Seq[(String, String)] = {
    val n = normalize(t)
    def inner(prefix: String): Option[String] =
      if (n.startsWith(prefix) && n.endsWith(">"))
        Some(n.substring(prefix.length, n.length - 1)) else None
    inner("list<").map(e => Seq("element" -> e))
      .orElse(inner("struct<").map(fs => splitTop(fs).map { f =>
        val i = f.indexOf(':'); (f.substring(0, i).trim, f.substring(i + 1))
      }))
      .orElse(inner("map<").map(kv => splitTop(kv) match {
        case Seq(k, v) => Seq("key" -> k, "value" -> v)
        case _ => Nil
      }))
      .getOrElse {
        if (n.endsWith("[]")) Seq("element" -> n.dropRight(2)) else Nil
      }
  }

  /** Number of `ducklake_column` NODES a type occupies under the spec's
    * depth-first numbering (the root plus every nested node — list
    * elements, struct fields, map key/value each get their own id).
    */
  def nodeCount(t: String): Int =
    1 + childNodes(t).map(c => nodeCount(c._2)).sum

  /** Depth-first LEAF nodes inside `t`: (dot-path from the root column
    * name, id offset relative to the root's id, leaf duck type). A
    * primitive type has no entries — its root IS the leaf.
    */
  def leafNodes(rootName: String, t: String): Seq[(String, Int, String)] = {
    val out = Seq.newBuilder[(String, Int, String)]
    var next = 1 // offset 0 = the root node itself
    def walk(path: String, ty: String): Unit = childNodes(ty).foreach {
      case (cn, ct) =>
        val off = next; next += 1
        if (childNodes(ct).isEmpty) out += ((s"$path.$cn", off, normalize(ct)))
        else walk(s"$path.$cn", ct)
    }
    walk(rootName, t)
    out.result()
  }

  /** Split a nested-type argument list on top-level commas only
    * (`a:int32,b:struct<c:int64,d:varchar>` → two parts).
    */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '<' | '(' => depth += 1
        case '>' | ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
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
    case _: TimeType         => "time"
    case TimestampNTZType    => "timestamp"
    case TimestampType       => "timestamptz"
    case StringType          => "varchar"
    case BinaryType          => "blob"
    case d: DecimalType      => s"decimal(${d.precision},${d.scale})"
    case ArrayType(e, _)     => s"list<${fromSpark(e)}>"
    case st: StructType =>
      st.fields.foreach { f =>
        if (f.name.exists(c => c == ':' || c == ',' || c == '<' || c == '>'))
          throw new UnsupportedTypeException(
            s"struct field name not encodable in catalog: ${f.name}")
      }
      s"struct<${st.fields.map(f => s"${f.name}:${fromSpark(f.dataType)}").mkString(",")}>"
    case mt: MapType =>
      s"map<${fromSpark(mt.keyType)},${fromSpark(mt.valueType)}>"
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
    // unsigned widths fit the NEXT-wider signed type (uint8 ⊂ int16 …);
    // the reverse never holds (reference acceptance matrix — corpus:
    // add_files/add_files_type_check_integer.test)
    val uintToInt = {
      val (fi, ti) = (uintWidening.indexOf(f), intWidening.indexOf(t))
      fi >= 0 && ti > fi
    }
    // json is varchar-compatible physically; varchar carries no json
    // guarantee, so only the widening direction holds… neither direction
    // actually: DuckDB rejects varchar files into JSON columns too.
    chainOk(intWidening) || chainOk(uintWidening) || uintToInt ||
      intToFloat64 || floatWiden || tsToTz || decimalWiden
  }

  /** Whether two types are identical after normalization or promotable
    * (reference: src/types.rs:406-423 `types_compatible`). Nested types
    * evolve structurally: struct fields may be added, dropped, or
    * promoted (DuckLake struct evolution — corpus: alter/struct_evolution
    * .test); lists and maps evolve through their element/value types.
    */
  def typesCompatible(from: String, to: String): Boolean = {
    val (f, t) = (normalize(from), normalize(to))
    if (f == t || isPromotable(from, to)) return true
    // plain WKB blobs adopt into geometry columns (native-parquet
    // geometry IS a blob column; corpus: geo/ducklake_geometry_add_files
    // — GeoParquet-marked files are surfaced as 'geoparquet' and refused)
    if (f == "blob" && isGeometry(t)) return true
    // timestamp precision family (ADOPTION lattice, distinct from the
    // evolution lattice above): {s, ms, µs} files adopt into any
    // {s, ms, µs, ns} column — the scan truncates to the declared
    // precision — while NANOS files adopt only into µs/ns columns,
    // never into coarser s/ms (reference acceptance matrix:
    // tests/sqllogictests/sql/add_files/add_files_type_check_timestamp.test;
    // the µs read of a NANOS file floor-truncates, exactly the
    // reference's ns→µs conversion in src/types.rs:53-55)
    val tsCoarse = Set("timestamp", "timestamp_s", "timestamp_ms")
    if (tsCoarse(f) && (tsCoarse(t) || t == "timestamp_ns")) return true
    if (f == "timestamp_ns" && (t == "timestamp" || t == "timestamp_ns")) return true
    def inner(s: String, prefix: String): Option[String] =
      if (s.startsWith(prefix) && s.endsWith(">"))
        Some(s.substring(prefix.length, s.length - 1))
      else None
    (inner(f, "struct<"), inner(t, "struct<")) match {
      case (Some(ff), Some(tf)) =>
        def fieldsOf(s: String): Seq[(String, String)] = splitTop(s).map { e =>
          val i = e.indexOf(':'); (e.substring(0, i).trim.toLowerCase, e.substring(i + 1))
        }
        val fm = fieldsOf(ff).toMap
        return fieldsOf(tf).forall { case (n, tt) =>
          fm.get(n).forall(ft => typesCompatible(ft, tt)) }
      case _ => ()
    }
    (inner(f, "list<"), inner(t, "list<")) match {
      case (Some(fe), Some(te)) => return typesCompatible(fe, te)
      case _ => ()
    }
    (inner(f, "map<"), inner(t, "map<")) match {
      case (Some(fe), Some(te)) =>
        return (splitTop(fe), splitTop(te)) match {
          case (Seq(fk, fv), Seq(tk, tv)) =>
            normalize(fk) == normalize(tk) && typesCompatible(fv, tv)
          case _ => false
        }
      case _ => ()
    }
    false
  }
}
