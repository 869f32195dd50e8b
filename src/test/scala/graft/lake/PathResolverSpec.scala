package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** Port of the path-security tests (reference: src/path_resolver.rs:354+). */
class PathResolverSpec extends AnyFunSuite {

  test("traversal rejected") {
    assertThrows[InvalidConfigException](PathResolver.validate("../x"))
    assertThrows[InvalidConfigException](PathResolver.validate("a/../b"))
    assertThrows[InvalidConfigException](PathResolver.validate("a\\..\\b"))
    assertThrows[InvalidConfigException](PathResolver.validate("a/%2e%2e/b"))
    assertThrows[InvalidConfigException](PathResolver.validate("a/%2E%2E/b"))
    assertThrows[InvalidConfigException](PathResolver.validate("a\u0000b"))
  }

  test("normal paths pass") {
    assert(PathResolver.validate("a/b/c.parquet") == "a/b/c.parquet")
    assert(PathResolver.validate("weird..name.parquet") == "weird..name.parquet")
  }

  test("join honors relative flag") {
    assert(PathResolver.join("/lake", "t/f.parquet", childIsRelative = true) == "/lake/t/f.parquet")
    assert(PathResolver.join("/lake/", "t/f.parquet", childIsRelative = true) == "/lake/t/f.parquet")
    assert(PathResolver.join("/lake", "/abs/f.parquet", childIsRelative = false) == "/abs/f.parquet")
  }

  test("hierarchical resolve") {
    assert(PathResolver.resolveFile("/lake", "main/", true, "t/", true, "f.parquet", true)
      == "/lake/main/t/f.parquet")
  }

  test("name validation (reference: metadata_writer.rs:17-36)") {
    assertThrows[InvalidConfigException](PathResolver.validateName(""))
    assertThrows[InvalidConfigException](PathResolver.validateName("a\nb"))
    assertThrows[InvalidConfigException](PathResolver.validateName("x" * 1025))
    assertThrows[InvalidConfigException](PathResolver.validateTableName("a/b"))
    assertThrows[InvalidConfigException](PathResolver.validateTableName("a..b"))
    assert(PathResolver.validateTableName("lineitem") == "lineitem")
  }
}
