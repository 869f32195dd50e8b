package graft.lake

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's type-mapping and promotion unit tests
  * (reference: src/types.rs:500-1301), upgraded with exhaustive
  * property-style checks over the lattice.
  */
class TypeBridgeSpec extends AnyFunSuite {

  test("alias normalization round-trips") {
    assert(TypeBridge.normalize("BOOL") == "boolean")
    assert(TypeBridge.normalize("BIGINT") == "int64")
    assert(TypeBridge.normalize("text") == "varchar")
    assert(TypeBridge.normalize("double") == "float64")
    assert(TypeBridge.normalize("utinyint") == "uint8")
  }

  test("read-direction mapping") {
    assert(TypeBridge.toSpark("int32") == IntegerType)
    assert(TypeBridge.toSpark("varchar") == StringType)
    assert(TypeBridge.toSpark("timestamp") == TimestampNTZType)
    assert(TypeBridge.toSpark("timestamptz") == TimestampType)
    assert(TypeBridge.toSpark("decimal(10,2)") == DecimalType(10, 2))
    assert(TypeBridge.toSpark("list<float32>") == ArrayType(FloatType, containsNull = true))
    assert(TypeBridge.toSpark("int[]") == ArrayType(IntegerType, containsNull = true))
    // deliberate deviations (SURVEY §1.3)
    assert(TypeBridge.toSpark("uint8") == ShortType)
    assert(TypeBridge.toSpark("uint64") == DecimalType(20, 0))
    assert(TypeBridge.toSpark("uuid") == BinaryType)
  }

  test("nested struct/map/list round-trip (extension beyond types.rs:74-85 rejection)") {
    assert(TypeBridge.toSpark("struct<a:int32,b:varchar>") ==
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
    assert(TypeBridge.toSpark("map<varchar,int64>") ==
      MapType(StringType, LongType))
    assert(TypeBridge.toSpark("list<list<int32>>") ==
      ArrayType(ArrayType(IntegerType)))
    // deep nesting both directions
    val deep = StructType(Seq(StructField("xs", ArrayType(
      StructType(Seq(StructField("m", MapType(StringType, DoubleType)))))) ))
    assert(TypeBridge.toSpark(TypeBridge.fromSpark(deep)) == deep)
    // un-encodable field names rejected
    assertThrows[UnsupportedTypeException](
      TypeBridge.fromSpark(StructType(Seq(StructField("a:b", IntegerType)))))
  }

  test("oversized/invalid decimals rejected (parity: types.rs:167-251)") {
    assertThrows[UnsupportedTypeException](TypeBridge.toSpark("decimal(40,2)"))
    assertThrows[UnsupportedTypeException](TypeBridge.toSpark("decimal(0,0)"))
    assertThrows[UnsupportedTypeException](TypeBridge.toSpark("decimal(5,9)"))
  }

  test("write-direction mapping inverts read for core types") {
    for (t <- Seq("boolean", "int8", "int16", "int32", "int64", "float32",
        "float64", "date", "timestamp", "timestamptz", "varchar", "blob",
        "decimal(12,3)", "list<int64>"))
      assert(TypeBridge.normalize(TypeBridge.fromSpark(TypeBridge.toSpark(t)))
        == TypeBridge.normalize(t))
  }

  test("promotion lattice (parity: types.rs:322-400)") {
    assert(TypeBridge.isPromotable("int8", "int64"))
    assert(TypeBridge.isPromotable("int32", "float64"))
    assert(TypeBridge.isPromotable("float32", "float64"))
    assert(TypeBridge.isPromotable("timestamp", "timestamptz"))
    assert(TypeBridge.isPromotable("decimal(10,2)", "decimal(12,2)"))
    assert(TypeBridge.isPromotable("decimal(10,2)", "decimal(12,4)"))
    assert(!TypeBridge.isPromotable("int64", "int32"))
    assert(!TypeBridge.isPromotable("float64", "float32"))
    assert(!TypeBridge.isPromotable("decimal(12,4)", "decimal(12,2)"))
    assert(!TypeBridge.isPromotable("varchar", "int32"))
    assert(!TypeBridge.isPromotable("timestamptz", "timestamp"))
  }

  test("property: int widening is transitive and antisymmetric (exhaustive)") {
    val ints = Seq("int8", "int16", "int32", "int64")
    for (a <- ints; b <- ints; c <- ints) {
      if (TypeBridge.isPromotable(a, b) && TypeBridge.isPromotable(b, c))
        assert(TypeBridge.isPromotable(a, c), s"$a->$b->$c")
      if (a != b && TypeBridge.isPromotable(a, b))
        assert(!TypeBridge.isPromotable(b, a), s"$a<->$b")
    }
  }

  test("property: decimal widening iff int-digits and scale both non-shrinking (exhaustive grid)") {
    val grid = for (p <- 1 to 38 by 4; s <- 0 to p by 3) yield (p, s)
    for ((p1, s1) <- grid; (p2, s2) <- grid) {
      val expected = (p2 - s2) >= (p1 - s1) && s2 >= s1
      assert(TypeBridge.isPromotable(s"decimal($p1,$s1)", s"decimal($p2,$s2)") == expected,
        s"decimal($p1,$s1)->decimal($p2,$s2)")
    }
  }
}
