package graft.lake

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal GEOMETRY support for the lake (reference: the `geo` corpus dir
  * and src/types.rs:67-68 — geometry rides a WKB BLOB carrier; the
  * reference's spatial extension supplies the function surface).
  *
  * Implemented here from the public WKT/WKB specs (OGC Simple Features,
  * ISO 13249-3 Z/M type codes): parse WKT (POINT/LINESTRING/POLYGON and
  * MULTI* with Z/M/ZM), encode little-endian ISO WKB, render back, and
  * compute the DuckLake `extra_stats` geometry summary (bbox + type set)
  * the catalog stores per file/table.
  */
object Geo {

  /** bbox accumulator; NaN = dimension absent so far. */
  final case class GeoStats(
      xmin: Double, xmax: Double, ymin: Double, ymax: Double,
      zmin: Double, zmax: Double, mmin: Double, mmax: Double,
      types: Set[String]) {
    def merge(o: GeoStats): GeoStats = GeoStats(
      nmin(xmin, o.xmin), nmax(xmax, o.xmax), nmin(ymin, o.ymin), nmax(ymax, o.ymax),
      nmin(zmin, o.zmin), nmax(zmax, o.zmax), nmin(mmin, o.mmin), nmax(mmax, o.mmax),
      types ++ o.types)

    /** The catalog's extra_stats JSON, exactly as the reference renders
      * it: %f-formatted bounds, null for absent dimensions, sorted type
      * list (corpus: geo/ducklake_geometry.test).
      */
    def toJson: String = {
      def f(v: Double): String = if (v.isNaN) "null" else "%.6f".formatLocal(java.util.Locale.ROOT, v)
      s"""{"bbox": {"xmin": ${f(xmin)}, "xmax": ${f(xmax)}, "ymin": ${f(ymin)}, "ymax": ${f(ymax)}, """ +
        s""""zmin": ${f(zmin)}, "zmax": ${f(zmax)}, "mmin": ${f(mmin)}, "mmax": ${f(mmax)}}, """ +
        s""""types": [${types.toSeq.sorted.map(t => s""""$t"""").mkString(", ")}]}"""
    }
  }

  val emptyStats: GeoStats = GeoStats(Double.NaN, Double.NaN, Double.NaN,
    Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Set.empty)

  private def nmin(a: Double, b: Double): Double =
    if (a.isNaN) b else if (b.isNaN) a else math.min(a, b)
  private def nmax(a: Double, b: Double): Double =
    if (a.isNaN) b else if (b.isNaN) a else math.max(a, b)

  /** Parse one of the catalog's extra_stats JSONs back (for merging two
    * already-stored summaries — table stats union file stats).
    */
  def parseStatsJson(json: String): Option[GeoStats] = {
    def d(k: String): Double = {
      val m = (s""""$k": (null|-?[0-9.]+)""").r.findFirstMatchIn(json)
      m.map(_.group(1)).filter(_ != "null").map(_.toDouble).getOrElse(Double.NaN)
    }
    val typesRe = """"types": \[([^\]]*)\]""".r
    typesRe.findFirstMatchIn(json).map { tm =>
      val ts = "\"([a-z_]+)\"".r.findAllMatchIn(tm.group(1)).map(_.group(1)).toSet
      GeoStats(d("xmin"), d("xmax"), d("ymin"), d("ymax"),
        d("zmin"), d("zmax"), d("mmin"), d("mmax"), ts)
    }
  }

  def mergeStatsJson(a: Option[String], b: Option[String]): Option[String] =
    (a.flatMap(parseStatsJson), b.flatMap(parseStatsJson)) match {
      case (Some(x), Some(y)) => Some(x.merge(y).toJson)
      case (Some(x), None)    => Some(x.toJson)
      case (None, Some(y))    => Some(y.toJson)
      case _                  => None
    }

  // ---- geometry model (enough for stats + WKT round trip) ------------

  private val BaseNames = Map(
    1 -> "POINT", 2 -> "LINESTRING", 3 -> "POLYGON",
    4 -> "MULTIPOINT", 5 -> "MULTILINESTRING", 6 -> "MULTIPOLYGON",
    7 -> "GEOMETRYCOLLECTION")
  private val BaseCodes = BaseNames.map(_.swap)

  /** One geometry: base WKB code (1-7), Z/M flags, coordinate payload.
    * `coords`: flat per-ring/part structure mirroring WKT nesting depth —
    * points: one coord; linestring: seq of coords; polygon: seq of rings;
    * multi*: seq of child geometries.
    */
  sealed trait Geom { def base: Int; def hasZ: Boolean; def hasM: Boolean }
  final case class Pt(base: Int, hasZ: Boolean, hasM: Boolean,
      coord: Array[Double]) extends Geom
  final case class Line(base: Int, hasZ: Boolean, hasM: Boolean,
      coords: Seq[Array[Double]]) extends Geom
  final case class Poly(base: Int, hasZ: Boolean, hasM: Boolean,
      rings: Seq[Seq[Array[Double]]]) extends Geom
  final case class Multi(base: Int, hasZ: Boolean, hasM: Boolean,
      parts: Seq[Geom]) extends Geom

  private def dims(hasZ: Boolean, hasM: Boolean): Int =
    2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)

  /** DuckLake stats type tag: lowercase base + _z/_m/_zm suffix. */
  def typeTag(g: Geom): String = {
    val suffix =
      if (g.hasZ && g.hasM) "_zm" else if (g.hasZ) "_z"
      else if (g.hasM) "_m" else ""
    BaseNames(g.base).toLowerCase + suffix
  }

  // ---- WKT ------------------------------------------------------------

  /** Parse a WKT string; throws IllegalArgumentException on malformed
    * input (surfaces as a conversion error, like the reference).
    */
  def fromWkt(wkt0: String): Geom = {
    val s = wkt0.trim
    val m = """(?is)^([A-Za-z]+)\s*(ZM|Z|M)?\s*\((.*)\)$""".r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"malformed WKT: $wkt0"))
    val base = BaseCodes.getOrElse(m.group(1).toUpperCase,
      throw new IllegalArgumentException(s"unknown WKT type: ${m.group(1)}"))
    val flag = Option(m.group(2)).map(_.toUpperCase).getOrElse("")
    val (hasZ, hasM) = (flag.contains("Z"), flag.contains("M"))
    val body = m.group(3).trim
    val nd = dims(hasZ, hasM)

    def coord(t: String): Array[Double] = {
      val parts = t.trim.split("\\s+").map(_.toDouble)
      require(parts.length == nd, s"expected $nd ordinates in '$t'")
      parts
    }
    def coordList(t: String): Seq[Array[Double]] =
      splitTop(t).map(coord)
    def ringList(t: String): Seq[Seq[Array[Double]]] =
      splitTop(t).map(r => coordList(strip(r)))

    base match {
      case 1 => Pt(base, hasZ, hasM, coord(body))
      case 2 => Line(base, hasZ, hasM, coordList(body))
      case 3 => Poly(base, hasZ, hasM, ringList(body))
      case 4 => Multi(base, hasZ, hasM, splitTop(body).map { p =>
        Pt(1, hasZ, hasM, coord(strip(p)))
      })
      case 5 => Multi(base, hasZ, hasM, splitTop(body).map { p =>
        Line(2, hasZ, hasM, coordList(strip(p)))
      })
      case 6 => Multi(base, hasZ, hasM, splitTop(body).map { p =>
        Poly(3, hasZ, hasM, ringList(strip(p)))
      })
      case other =>
        throw new IllegalArgumentException(s"WKT type not supported: $other")
    }
  }

  /** Split a WKT body on TOP-LEVEL commas only. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }
  private def strip(s0: String): String = {
    val s = s0.trim
    if (s.startsWith("(") && s.endsWith(")")) s.substring(1, s.length - 1) else s
  }

  private def fmt(v: Double): String =
    if (v == math.rint(v) && !v.isInfinite) v.toLong.toString else v.toString

  def toWkt(g: Geom): String = {
    val flag =
      if (g.hasZ && g.hasM) " ZM" else if (g.hasZ) " Z"
      else if (g.hasM) " M" else ""
    def cs(c: Array[Double]): String = c.map(fmt).mkString(" ")
    val body = g match {
      case Pt(_, _, _, c)      => cs(c)
      case Line(_, _, _, cs0)  => cs0.map(cs).mkString(", ")
      case Poly(_, _, _, rs)   => rs.map(r => "(" + r.map(cs).mkString(", ") + ")").mkString(", ")
      case Multi(4, _, _, ps)  => ps.map { case Pt(_, _, _, c) => "(" + cs(c) + ")" }.mkString(", ")
      case Multi(5, _, _, ps)  => ps.map { case Line(_, _, _, cs0) => "(" + cs0.map(cs).mkString(", ") + ")" }.mkString(", ")
      case Multi(_, _, _, ps)  => ps.map { case Poly(_, _, _, rs) =>
        "(" + rs.map(r => "(" + r.map(cs).mkString(", ") + ")").mkString(", ") + ")" }.mkString(", ")
    }
    s"${BaseNames(g.base)}$flag ($body)"
  }

  // ---- WKB (little-endian ISO: Z = +1000, M = +2000) ------------------

  private def wkbType(g: Geom): Int =
    g.base + (if (g.hasZ) 1000 else 0) + (if (g.hasM) 2000 else 0)

  def toWkb(g: Geom): Array[Byte] = {
    val buf = ByteBuffer.allocate(wkbSize(g)).order(ByteOrder.LITTLE_ENDIAN)
    write(g, buf)
    buf.array()
  }

  private def wkbSize(g: Geom): Int = {
    val nd = dims(g.hasZ, g.hasM)
    5 + (g match {
      case Pt(_, _, _, _)     => nd * 8
      case Line(_, _, _, cs)  => 4 + cs.length * nd * 8
      case Poly(_, _, _, rs)  => 4 + rs.map(r => 4 + r.length * nd * 8).sum
      case Multi(_, _, _, ps) => 4 + ps.map(wkbSize).sum
    })
  }

  private def write(g: Geom, buf: ByteBuffer): Unit = {
    buf.put(1.toByte).putInt(wkbType(g))
    g match {
      case Pt(_, _, _, c)     => c.foreach(buf.putDouble)
      case Line(_, _, _, cs)  =>
        buf.putInt(cs.length); cs.foreach(_.foreach(buf.putDouble))
      case Poly(_, _, _, rs)  =>
        buf.putInt(rs.length)
        rs.foreach { r => buf.putInt(r.length); r.foreach(_.foreach(buf.putDouble)) }
      case Multi(_, _, _, ps) =>
        buf.putInt(ps.length); ps.foreach(write(_, buf))
    }
  }

  /** Parse WKB; None when the bytes are not a fully-consumed well-formed
    * geometry (the corpus runner's render heuristic relies on strict
    * validation so arbitrary blobs never masquerade as WKT).
    */
  def fromWkb(bytes: Array[Byte]): Option[Geom] = {
    try {
      val buf = ByteBuffer.wrap(bytes)
      val g = read(buf)
      if (buf.remaining() == 0) Some(g) else None
    } catch { case _: Exception => None }
  }

  private def read(buf: ByteBuffer): Geom = {
    val order = buf.get() match {
      case 0 => ByteOrder.BIG_ENDIAN
      case 1 => ByteOrder.LITTLE_ENDIAN
      case other => throw new IllegalArgumentException(s"byte order $other")
    }
    buf.order(order)
    val t = buf.getInt
    val base = t % 1000
    val kind = t / 1000 // ISO: 0 = 2D, 1 = Z, 2 = M, 3 = ZM
    val hasZ = kind == 1 || kind == 3
    val hasM = kind == 2 || kind == 3
    require(base >= 1 && base <= 6 && kind >= 0 && kind <= 3, s"wkb type $t")
    val nd = dims(hasZ, hasM)
    def coord(): Array[Double] = Array.fill(nd)(buf.getDouble)
    def n(): Int = { val v = buf.getInt; require(v >= 0 && v < 1e7, s"count $v"); v }
    base match {
      case 1 => Pt(base, hasZ, hasM, coord())
      case 2 => Line(base, hasZ, hasM, Seq.fill(n())(coord()))
      case 3 => Poly(base, hasZ, hasM, Seq.fill(n())(Seq.fill(n())(coord())))
      case 4 | 5 | 6 => Multi(base, hasZ, hasM, Seq.fill(n())(read(buf)))
    }
  }

  /** Stats contribution of one geometry. Runs once per ROW inside the
    * distributed write-side pass — mutable accumulators, no per-
    * coordinate case-class copies.
    */
  def statsOf(g: Geom): GeoStats = {
    var (x0, x1, y0, y1) = (Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    var (z0, z1, m0, m1) = (Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    def touch(c: Array[Double], hasZ: Boolean, hasM: Boolean): Unit = {
      x0 = nmin(x0, c(0)); x1 = nmax(x1, c(0))
      y0 = nmin(y0, c(1)); y1 = nmax(y1, c(1))
      var i = 2
      if (hasZ) { z0 = nmin(z0, c(i)); z1 = nmax(z1, c(i)); i += 1 }
      if (hasM) { m0 = nmin(m0, c(i)); m1 = nmax(m1, c(i)) }
    }
    def walk(g: Geom): Unit = g match {
      case Pt(_, z, m, c)     => touch(c, z, m)
      case Line(_, z, m, cs)  => cs.foreach(touch(_, z, m))
      case Poly(_, z, m, rs)  => rs.foreach(_.foreach(touch(_, z, m)))
      case Multi(_, _, _, ps) => ps.foreach(walk)
    }
    walk(g)
    GeoStats(x0, x1, y0, y1, z0, z1, m0, m1, Set(typeTag(g)))
  }

  /** WKB bytes → stats (None when not valid WKB). */
  def statsOfWkb(bytes: Array[Byte]): Option[GeoStats] =
    fromWkb(bytes).map(statsOf)

  /** WKB bytes → WKT rendering (None when not valid WKB). */
  def wkbToWkt(bytes: Array[Byte]): Option[String] = fromWkb(bytes).map(toWkt)

  def wktToWkb(wkt: String): Array[Byte] = toWkb(fromWkt(wkt))
}
