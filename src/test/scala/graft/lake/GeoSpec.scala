package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the WKT/WKB geometry codec and the extra_stats
  * summary math the geo corpus files exercise only through points and
  * linestrings — polygons, multis and the malformed-input edges live
  * here.
  */
class GeoSpec extends AnyFunSuite {

  private def roundTrip(wkt: String): String =
    Geo.toWkt(Geo.fromWkb(Geo.wktToWkb(wkt)).get)

  test("WKT → WKB → WKT round trips across the type lattice") {
    val cases = Seq(
      "POINT (1 2)",
      "POINT Z (1 2 3)",
      "POINT M (1 2 4)",
      "POINT ZM (1 2 3 4)",
      "LINESTRING (0 0, 1 1, 2 0)",
      "LINESTRING Z (5 5 5, 10 10 10)",
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
    cases.foreach(w => assert(roundTrip(w) == w, s"round trip of $w"))
  }

  test("negative and fractional ordinates survive; rendering is integral when exact") {
    assert(roundTrip("POINT ZM (-30 -30 -30 -30)") == "POINT ZM (-30 -30 -30 -30)")
    assert(roundTrip("POINT (1.5 -2.25)") == "POINT (1.5 -2.25)")
  }

  test("strict WKB validation rejects non-geometry blobs") {
    assert(Geo.fromWkb("not wkb at all".getBytes("UTF-8")).isEmpty)
    assert(Geo.fromWkb(Array[Byte](0, 0, 0, 0, 97)).isEmpty) // bad type
    assert(Geo.fromWkb(Array[Byte](1)).isEmpty)              // truncated
    // trailing garbage after a valid geometry must NOT parse
    val ok = Geo.wktToWkb("POINT (1 2)")
    assert(Geo.fromWkb(ok :+ 0.toByte).isEmpty)
  }

  test("stats: bbox per dimension, type tags, union merge, JSON round trip") {
    val p = Geo.statsOf(Geo.fromWkt("POINT (1 2)"))
    assert(p.toJson.contains(""""xmin": 1.000000""") &&
      p.toJson.contains(""""zmin": null""") && p.types == Set("point"))
    val lz = Geo.statsOf(Geo.fromWkt("LINESTRING Z (5 5 5, 10 10 10)"))
    assert(lz.types == Set("linestring_z") && lz.zmin == 5.0 && lz.zmax == 10.0)
    val merged = p.merge(lz)
    assert(merged.xmin == 1.0 && merged.xmax == 10.0 &&
      merged.types == Set("linestring_z", "point"))
    // JSON parse → merge equals struct merge
    val viaJson = Geo.mergeStatsJson(Some(p.toJson), Some(lz.toJson)).get
    assert(viaJson == merged.toJson)
    // M-only geometry leaves z null, fills m
    val pm = Geo.statsOf(Geo.fromWkt("POINT M (20 20 5)"))
    assert(pm.toJson.contains(""""zmin": null""") &&
      pm.toJson.contains(""""mmin": 5.000000""") && pm.types == Set("point_m"))
  }

  test("malformed WKT is rejected loudly") {
    intercept[IllegalArgumentException](Geo.fromWkt("CIRCLE (1 2 3)"))
    intercept[IllegalArgumentException](Geo.fromWkt("POINT 1 2"))
    intercept[Exception](Geo.fromWkt("POINT (1)")) // wrong arity
  }
}
