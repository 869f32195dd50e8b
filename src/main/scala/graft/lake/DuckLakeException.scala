package graft.lake

/** Error taxonomy mirroring the reference's `DuckLakeError` enum
  * (reference: src/error.rs:7-84).
  */
sealed abstract class DuckLakeException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

final class CatalogNotFoundException(name: String)
    extends DuckLakeException(s"Catalog not found: $name")
final class SchemaNotFoundException(name: String)
    extends DuckLakeException(s"Schema not found: $name")
final class TableNotFoundException(name: String)
    extends DuckLakeException(s"Table not found: $name")
final class InvalidSnapshotException(msg: String) extends DuckLakeException(msg)
final class InvalidConfigException(msg: String) extends DuckLakeException(msg)
final class UnsupportedTypeException(msg: String) extends DuckLakeException(msg)
final class UnsupportedException(msg: String) extends DuckLakeException(msg)
final class ConstraintViolationException(msg: String) extends DuckLakeException(msg)
final class TransactionConflictException(msg: String) extends DuckLakeException(msg)
final class InternalException(msg: String, cause: Throwable = null)
    extends DuckLakeException(msg, cause)
