package graft.lake

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Property-based tests for the promotion lattice and type bridge —
  * the SURVEY §5 upgrade over the reference's example-based tests
  * (reference: src/types.rs:500-1301 unit tests).
  */
object TypeBridgeProps extends Properties("TypeBridge") {

  private val aliasGroups: List[List[String]] = List(
    List("bool", "boolean"), List("int8", "tinyint"),
    List("int16", "smallint", "short"), List("int32", "int", "integer"),
    List("int64", "bigint", "long"), List("uint8", "utinyint"),
    List("uint16", "usmallint"), List("uint32", "uinteger"),
    List("uint64", "ubigint"), List("float32", "float", "real"),
    List("float64", "double"), List("varchar", "text", "string"),
    List("blob", "binary", "bytea"), List("timestamp", "datetime"),
    List("timestamptz", "timestamp with time zone"))

  private val genAlias: Gen[String] = for {
    group <- Gen.oneOf(aliasGroups)
    alias <- Gen.oneOf(group)
    cased <- Gen.oneOf(alias, alias.toUpperCase, alias.capitalize)
    padded <- Gen.oneOf(cased, s" $cased", s"$cased ", s"  $cased  ")
  } yield padded

  private val genDecimal: Gen[String] = for {
    p <- Gen.chooseNum(1, 38)
    s <- Gen.chooseNum(0, p)
  } yield s"decimal($p,$s)"

  private val latticeTypes: Gen[String] = Gen.oneOf(
    Gen.oneOf("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
      "uint64", "float32", "float64", "timestamp", "timestamptz", "varchar",
      "boolean", "date", "blob"),
    genDecimal)

  private val canonicalRoundTrip: Gen[String] = Gen.oneOf(
    Gen.oneOf("boolean", "int8", "int16", "int32", "int64", "float32",
      "float64", "date", "timestamp", "timestamptz", "varchar", "blob",
      "interval"),
    genDecimal,
    Gen.oneOf("int32", "int64", "float32", "varchar").map(e => s"list<$e>"))

  property("normalize is idempotent") = forAll(genAlias) { t =>
    TypeBridge.normalize(TypeBridge.normalize(t)) == TypeBridge.normalize(t)
  }

  property("aliases in one group normalize identically") =
    forAll(Gen.oneOf(aliasGroups)) { group =>
      group.map(TypeBridge.normalize).distinct.size == 1
    }

  property("toSpark is alias-invariant") = forAll(genAlias) { t =>
    TypeBridge.toSpark(t) == TypeBridge.toSpark(TypeBridge.normalize(t))
  }

  property("compatibility is reflexive") = forAll(latticeTypes) { t =>
    TypeBridge.typesCompatible(t, t)
  }

  property("promotion is transitive") =
    forAll(latticeTypes, latticeTypes, latticeTypes) { (a, b, c) =>
      !(TypeBridge.isPromotable(a, b) && TypeBridge.isPromotable(b, c)) ||
        TypeBridge.isPromotable(a, c)
    }

  property("promotion is antisymmetric") =
    forAll(latticeTypes, latticeTypes) { (a, b) =>
      !(TypeBridge.isPromotable(a, b) && TypeBridge.isPromotable(b, a)) ||
        TypeBridge.normalize(a) == TypeBridge.normalize(b)
    }

  property("decimal promotes iff integer digits and scale both non-shrink") =
    forAll(genDecimal, genDecimal) { (a, b) =>
      val D = """decimal\((\d+),(\d+)\)""".r
      val (D(p1, s1), D(p2, s2)) = (a, b): @unchecked
      val expected = (p2.toInt - s2.toInt) >= (p1.toInt - s1.toInt) &&
        s2.toInt >= s1.toInt
      TypeBridge.isPromotable(a, b) == expected
    }

  property("fromSpark(toSpark(t)) == normalize(t) for canonical types") =
    forAll(canonicalRoundTrip) { t =>
      TypeBridge.fromSpark(TypeBridge.toSpark(t)) == TypeBridge.normalize(t)
    }

  property("promoted types stay storable") =
    forAll(latticeTypes, latticeTypes) { (a, b) =>
      !TypeBridge.isPromotable(a, b) || {
        TypeBridge.toSpark(b); true // no exception
      }
    }

  // ---- depth-first node numbering (nested column ids) ----------------

  private val genNested: Gen[String] = {
    val prim = Gen.oneOf("int32", "int64", "varchar", "float64", "boolean")
    def tree(depth: Int): Gen[String] =
      if (depth <= 0) prim
      else Gen.frequency(
        3 -> prim,
        1 -> tree(depth - 1).map(e => s"list<$e>"),
        1 -> (for {
          n <- Gen.chooseNum(1, 3)
          fs <- Gen.listOfN(n, tree(depth - 1))
        } yield fs.zipWithIndex.map { case (t, i) => s"f$i:$t" }
          .mkString("struct<", ",", ">")),
        1 -> (for { k <- prim; v <- tree(depth - 1) } yield s"map<$k,$v>"))
    tree(3)
  }

  property("node count = 1 (root) + every nested node, leaves within range") =
    forAll(genNested) { t =>
      val n = TypeBridge.nodeCount(t)
      val leaves = TypeBridge.leafNodes("c", t)
      val offsets = leaves.map(_._2)
      // offsets are unique, strictly inside the root's reserved range,
      // and depth-first means they never exceed nodeCount - 1
      (n >= 1) :| s"nodeCount $n" &&
        (offsets.distinct.size == offsets.size) :| "unique offsets" &&
        offsets.forall(o => o >= 1 && o <= n - 1) :| s"offsets $offsets in 1..${n - 1}" &&
        (leaves.map(_._1).distinct.size == leaves.size) :| "unique leaf paths" &&
        leaves.forall(_._1.startsWith("c.")) :| "paths rooted at the column"
    }

  property("primitives occupy exactly one node and have no leaves") =
    forAll(Gen.oneOf("int32", "varchar", "float64", "date", "uint32")) { t =>
      TypeBridge.nodeCount(t) == 1 && TypeBridge.leafNodes("c", t).isEmpty
    }

}

/** Path-validation properties (reference: src/path_resolver.rs:354+ tests). */
object PathResolverProps extends Properties("PathResolver") {

  private val segment: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_ != "..")

  private val cleanPath: Gen[String] =
    Gen.nonEmptyListOf(segment).map(_.mkString("/"))

  property("clean relative paths validate and join under the base") =
    forAll(cleanPath, cleanPath) { (base, child) =>
      val joined = PathResolver.join(base, child, childIsRelative = true)
      joined.startsWith(base) && joined.endsWith(child)
    }

  property("any ../ segment anywhere is rejected") =
    forAll(Gen.listOf(segment), Gen.listOf(segment)) { (pre, post) =>
      val p = (pre :+ "..") ++ post
      scala.util.Try(PathResolver.validate(p.mkString("/"))).isFailure
    }

  property("null bytes are rejected") = forAll(cleanPath) { p =>
    scala.util.Try(PathResolver.validate(p + "\u0000x")).isFailure
  }

  property("percent-encoded traversal is rejected in any case mix") =
    forAll(cleanPath, Gen.oneOf("%2e%2e", "%2E%2E", "%2e.", ".%2e")) { (p, enc) =>
      scala.util.Try(PathResolver.validate(s"$p/$enc/x")).isFailure
    }

  property("names with control chars are rejected") =
    forAll(segment, Gen.chooseNum(0, 31)) { (name, c) =>
      scala.util.Try(PathResolver.validateName(name + c.toChar)).isFailure
    }

  property("table names with separators are rejected") =
    forAll(segment, segment) { (a, b) =>
      scala.util.Try(PathResolver.validateTableName(s"$a/$b")).isFailure &&
        scala.util.Try(PathResolver.validateTableName(s"$a\\$b")).isFailure
    }

  property("plain alphanumeric names validate") = forAll(segment) { name =>
    PathResolver.validateName(name) == name &&
      PathResolver.validateTableName(name) == name
  }


}
