package graft.lake

import java.sql.{Connection, DriverManager}

/** The RDBMS seam of the metadata catalog — the role of the reference's
  * `trait MetadataProvider` (src/metadata_provider.rs:544-619), which it
  * implements four times (Postgres src/metadata_provider_postgres.rs,
  * MySQL src/metadata_provider_mysql.rs, SQLite, DuckDB). Everything
  * engine-specific lives behind this trait: how to boot and connect,
  * how the engine shuts down, and which dialect capabilities the
  * store's SQL generation may rely on. [[MetadataStore]] holds the
  * backend-agnostic business logic — the 7 `ducklake_*` tables,
  * snapshot-windowed reads, the transactional commit protocol — so a
  * network backend (Postgres/MySQL) is an implementation of THIS trait
  * plus its driver jar, not a rewrite of the store (the r13 gap: the
  * store was a concrete Derby class, making a second backend a
  * refactor instead of a drop-in).
  */
trait MetadataBackend {

  /** Identity key: stores sharing a key share one physical database —
    * drives the METADATA_SCHEMA multiplexing refcount, so the engine
    * shuts down only when the LAST store on the key closes.
    */
  def key: String

  /** Open a connection, booting/creating the database as needed. */
  def connect(): Connection

  /** Engine-level shutdown, invoked once when the last store on [[key]]
    * closes. Embedded engines need it to release page-cache fds; a
    * network backend's impl is a no-op (the server outlives clients).
    *
    * (A network backend would also widen this trait with the dialect
    * capabilities the store currently assumes ANSI-portable — e.g.
    * LATERAL support, which would replace the correlated-MAX rewrite in
    * `loadDataFiles` with the reference's LATERAL form. The two
    * embedded impls share Derby's dialect, so that axis stays
    * unexpanded rather than shipping an unexercised SQL branch.)
    */
  def shutdown(): Unit
}

/** On-disk embedded Derby — the default production backend (embedded,
  * single-process; role-equivalent of the reference's SQLite backend).
  */
final class DerbyFileBackend(dbPath: String) extends MetadataBackend {
  // register the embedded driver in THIS classloader (DriverManager only
  // honors drivers whose loader matches the caller's — after an sbt
  // incremental recompile the old registration is invisible)
  Class.forName("org.apache.derby.jdbc.EmbeddedDriver")

  def key: String = s"derby:$dbPath"

  def connect(): Connection =
    DriverManager.getConnection(s"jdbc:derby:$dbPath;create=true")

  def shutdown(): Unit =
    // Derby signals successful shutdown via SQLState 08006 (an exception)
    try { DriverManager.getConnection(s"jdbc:derby:$dbPath;shutdown=true"); () }
    catch { case _: java.sql.SQLException => () }
}

/** In-memory embedded Derby — the second backend on the seam: no
  * filesystem footprint, `drop=true` shutdown semantics instead of
  * `shutdown=true` (the database ceases to exist). Selected by the
  * `memory:<name>` metadata-path scheme, so every catalog surface
  * (SQL connector included) can run on it unchanged.
  */
final class DerbyMemoryBackend(name: String) extends MetadataBackend {
  Class.forName("org.apache.derby.jdbc.EmbeddedDriver")

  def key: String = s"derby-memory:$name"

  def connect(): Connection =
    DriverManager.getConnection(s"jdbc:derby:memory:$name;create=true")

  def shutdown(): Unit =
    // drop=true deallocates the in-memory database; SQLState 08006 on
    // success, same contract as the on-disk shutdown
    try { DriverManager.getConnection(s"jdbc:derby:memory:$name;drop=true"); () }
    catch { case _: java.sql.SQLException => () }
}

object MetadataBackend {

  /** Resolve a catalog metadata path to a backend: the `memory:<name>`
    * scheme selects the in-memory engine; anything else is an on-disk
    * Derby database path. The scheme rides the ordinary metadata-path
    * string, so `spark.sql.catalog.<cat>.metadata_path=memory:x` just
    * works.
    */
  def forPath(dbPath: String): MetadataBackend =
    if (dbPath.startsWith("memory:"))
      new DerbyMemoryBackend(dbPath.stripPrefix("memory:"))
    else new DerbyFileBackend(dbPath)
}
