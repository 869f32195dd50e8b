package graft.lake

/** Catalog→schema→table→file hierarchical path resolution with the
  * reference's traversal hardening (reference: src/path_resolver.rs:12-83
  * validation, :115-352 resolve/join). Local-FS and generic-URI flavors
  * only — object-store schemes resolve through Hadoop's FileSystem when
  * Spark reads the resulting paths.
  */
object PathResolver {

  /** Reject path components that could escape the lake root
    * (reference: src/path_resolver.rs:12-83).
    */
  def validate(path: String): String = {
    if (path.contains('\u0000'))
      throw new InvalidConfigException(s"path contains null byte")
    val lower = path.toLowerCase
    if (lower.contains("%2e%2e") || lower.contains("%2e.") || lower.contains(".%2e"))
      throw new InvalidConfigException(s"path contains percent-encoded traversal: $path")
    val segs = path.split("[/\\\\]")
    if (segs.contains(".."))
      throw new InvalidConfigException(s"path contains parent traversal: $path")
    path
  }

  /** Join a base path and a child, honoring `childIsRelative`; validates
    * the child (reference: src/path_resolver.rs:230-290 `join_paths`).
    */
  def join(base: String, child: String, childIsRelative: Boolean): String = {
    validate(child)
    if (!childIsRelative) child
    else if (base.isEmpty) child
    else if (base.endsWith("/")) base + child
    else base + "/" + child
  }

  /** Resolve the full hierarchy: lake data_path → schema → table → file. */
  def resolveFile(
      dataPath: String,
      schemaPath: String, schemaRel: Boolean,
      tablePath: String, tableRel: Boolean,
      filePath: String, fileRel: Boolean): String = {
    val s = join(dataPath, schemaPath, schemaRel)
    val t = join(s, tablePath, tableRel)
    join(t, filePath, fileRel)
  }

  /** Entity-name validation (reference: src/metadata_writer.rs:17-36,
    * src/schema.rs:26-43).
    */
  def validateName(name: String): String = {
    if (name.isEmpty) throw new InvalidConfigException("entity name is empty")
    if (name.length > 1024)
      throw new InvalidConfigException(s"entity name too long (${name.length} > 1024)")
    if (name.exists(c => c < ' '))
      throw new InvalidConfigException("entity name contains control characters")
    name
  }

  /** Table names additionally reject path separators and traversal
    * (reference: src/table.rs:59-80).
    */
  def validateTableName(name: String): String = {
    validateName(name)
    if (name.contains('/') || name.contains('\\') || name.contains(".."))
      throw new InvalidConfigException(s"invalid table name: $name")
    name
  }

  /** Entity names as the reference accepts them: ANY printable
    * characters — schemas named `asd/fgh`, emoji tables — except the
    * bare traversal names. Safety comes from [[safeSegment]]: the STORED
    * path escapes every path-dangerous byte, so names never reach the
    * filesystem raw (corpus: general/paths.test, catalog/
    * quoted_identifiers.test).
    */
  def validateEntityName(name: String): String = {
    validateName(name)
    if (name == "." || name == "..")
      throw new InvalidConfigException(s"invalid entity name: $name")
    name
  }

  /** Filesystem-safe directory segment for an entity name: separators,
    * escapes and shell-dangerous bytes percent-encode (the same scheme
    * hive partition values use), so the result always passes
    * [[validate]] and never traverses or nests.
    */
  def safeSegment(name: String): String = {
    validateEntityName(name)
    val needs = "%/\\:=?#'\"<>|;*"
    val sb = new StringBuilder
    // byte-wise over UTF-8: non-ASCII escapes too, so directory names
    // stay locale-independent (a POSIX-locale JVM cannot create emoji
    // filenames)
    name.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val i = b & 0xff
      val c = i.toChar
      if (i >= 0x80 || needs.contains(c) || c < ' ' || c == '\u007f')
        sb.append(f"%%$i%02X")
      else sb.append(c)
    }
    sb.toString
  }
}
