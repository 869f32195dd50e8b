package graft.lake.connector

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.lake.crypto.GraftCryptoFactory
import graft.lake.{DuckLake, UnsupportedTypeException}

/** Snapshot offset for the DuckLake incremental stream: micro-batch (a, b]
  * = rows in data files whose `begin_snapshot` lies in that interval —
  * the same interval semantics as batch CDC `tableChanges` (reference:
  * src/table_functions.rs:86-225). The reference itself is batch-only;
  * this is the Spark-native extension SURVEY.md §2.B flags ("snapshot-
  * incremental `readStream` source").
  */
final case class SnapshotOffset(snapshot: Long) extends Offset {
  override def json(): String = snapshot.toString
}

/** One data file of one micro-batch. `physNames(i)` is the column's name
  * as written in THIS file's epoch (rename history resolved on the
  * driver; column_id ≙ field_id role, reference src/types.rs:440-498);
  * null marks a column added after the file was written. `isPartCol(i)`
  * marks hive partition columns, whose value comes from the catalog
  * (`partRaw(i)`, null = null partition) rather than the parquet.
  */
final case class DuckLakeFilePartition(path: String, encryptionKey: Option[String],
    physNames: Array[String], fieldTypes: Array[DataType],
    isPartCol: Array[Boolean], partRaw: Array[String]) extends InputPartition

/** Streaming source over a DuckLake table: appends-only (CDC-insert
  * semantics — Replace rewrites stream their files like inserts, exactly
  * as `getDataFilesAddedBetween` defines batch CDC). State is just the
  * last-committed snapshot id; at 100 TB the per-batch work is O(new
  * files), planned from the catalog with no data listing.
  */
final class DuckLakeMicroBatchStream(lake: DuckLake, fullName: String,
    required: StructType) extends MicroBatchStream {

  private val (schemaName, tableName) = fullName.split('.') match {
    case Array(s, t) => (s, t)
    case _           => ("main", fullName)
  }

  private def tableRec = {
    val snap = lake.store.currentSnapshot
    val sch = lake.store.getSchemaByName(schemaName, snap).get
    lake.store.getTableByName(sch.schemaId, tableName, snap).get
  }

  override def initialOffset(): Offset = SnapshotOffset(0L)

  override def latestOffset(): Offset = SnapshotOffset(lake.store.currentSnapshot)

  override def deserializeOffset(json: String): Offset = SnapshotOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (a, b) = (start.asInstanceOf[SnapshotOffset].snapshot,
      end.asInstanceOf[SnapshotOffset].snapshot)
    val tr = tableRec
    val cols = lake.store.getTableColumns(tr.tableId, b)
    val byName = cols.map(c => c.name -> c).toMap
    val history = lake.store.getColumnHistory(tr.tableId)
    required.fields.foreach { f =>
      if (!streamableType(f.dataType))
        throw new UnsupportedTypeException(
          s"stream read of ${f.dataType.simpleString} column ${f.name} not supported")
    }
    val partCols = lake.store.getPartitionColumns(tr.tableId, b)
    val partValsByFile =
      if (partCols.isEmpty) Map.empty[Long, Map[Int, Option[String]]]
      else lake.store.getFilePartitionValues(tr.tableId)
    val partIdxByColId = partCols.map { case (idx, cid) => cid -> idx }.toMap
    lake.store.getDataFilesAddedBetween(tr.tableId, a, b).map { file =>
      // per-file epoch: the physical (on-disk) name of each required column
      val physNames = required.fields.map { f =>
        byName.get(f.name).flatMap { cur =>
          history.find { case (h, begin, endS) =>
            h.columnId == cur.columnId && begin <= file.beginSnapshot &&
              endS.forall(_ > file.beginSnapshot)
          }.map(_._1.name)
        }.orNull
      }
      val isPartCol = required.fields.map(f =>
        byName.get(f.name).exists(c => partIdxByColId.contains(c.columnId)))
      val partRaw = required.fields.map { f =>
        (for {
          cur <- byName.get(f.name)
          idx <- partIdxByColId.get(cur.columnId)
          v <- partValsByFile.getOrElse(file.dataFileId, Map.empty).getOrElse(idx, None)
        } yield v).orNull
      }
      DuckLakeFilePartition(s"${lake.dataPath}/$schemaName/$tableName/${file.path}",
        file.encryptionKey, physNames, required.fields.map(_.dataType),
        isPartCol, partRaw)
        : InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // carry the driver's Hadoop conf to executors (credentials / fs
    // settings for non-local filesystems); `new Configuration()` on the
    // executor would silently drop the session conf
    new DuckLakeFileReaderFactory(new SerializableConfiguration(
      lake.spark.sparkContext.hadoopConfiguration))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  private def streamableType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         BooleanType | StringType | BinaryType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }
}

/** Executor-side reader: parquet-mr Group materialization (row-by-row) —
  * appropriate for the incremental tail of a stream, where batches are
  * small; the batch path keeps Spark's vectorized reader.
  */
final class DuckLakeFileReaderFactory(hconf: SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DuckLakeFilePartition]
    new PartitionReader[InternalRow] {
      private val reader: ParquetReader[Group] = {
        val b = ParquetReader.builder(new GroupReadSupport(), new Path(p.path))
          .withConf(hconf.value)
        p.encryptionKey.foreach(k =>
          b.withDecryption(GraftCryptoFactory.decryptionProps(k)))
        b.build()
      }
      private var current: Group = _

      override def next(): Boolean = { current = reader.read(); current != null }

      override def get(): InternalRow = {
        val row = new GenericInternalRow(p.physNames.length)
        var i = 0
        while (i < p.physNames.length) {
          val v =
            if (p.isPartCol(i)) parsePartValue(p.partRaw(i), p.fieldTypes(i))
            else readField(current, p.physNames(i), p.fieldTypes(i))
          row.update(i, v)
          i += 1
        }
        row
      }

      override def close(): Unit = reader.close()
    }
  }

  private def readField(g: Group, physName: String, dt: DataType): Any = {
    if (physName == null) return null // column added after this file epoch
    val idx = g.getType.getFieldIndex(physName)
    if (g.getFieldRepetitionCount(idx) == 0) return null
    dt match {
      case ByteType       => g.getInteger(idx, 0).toByte
      case ShortType      => g.getInteger(idx, 0).toShort
      case IntegerType    => g.getInteger(idx, 0)
      case DateType       => g.getInteger(idx, 0)
      case LongType       => g.getLong(idx, 0)
      case TimestampType | TimestampNTZType =>
        // Spark's default parquet writer emits TimestampType as INT96
        // (spark.sql.parquet.outputTimestampType=INT96); NTZ and
        // MICROS-configured writers emit INT64 µs. Handle both.
        g.getType.getType(idx).asPrimitiveType().getPrimitiveTypeName match {
          case PrimitiveTypeName.INT96 => int96ToMicros(g.getInt96(idx, 0).getBytes)
          case _                       => g.getLong(idx, 0) // µs since epoch
        }
      case FloatType      => g.getFloat(idx, 0)
      case DoubleType     => g.getDouble(idx, 0)
      case BooleanType    => g.getBoolean(idx, 0)
      case StringType     => UTF8String.fromString(g.getString(idx, 0))
      case BinaryType     => g.getBinary(idx, 0).getBytes
      case other => throw new UnsupportedTypeException(s"stream read: $other")
    }
  }

  /** Catalog-held hive partition value string → Spark internal value. */
  private def parsePartValue(raw: String, dt: DataType): Any = {
    if (raw == null) return null
    dt match {
      case ByteType    => raw.toByte
      case ShortType   => raw.toShort
      case IntegerType => raw.toInt
      case LongType    => raw.toLong
      case FloatType   => raw.toFloat
      case DoubleType  => raw.toDouble
      case BooleanType => raw.toBoolean
      case StringType  => UTF8String.fromString(raw)
      case DateType    => java.time.LocalDate.parse(raw).toEpochDay.toInt
      case other => throw new UnsupportedTypeException(s"stream partition col: $other")
    }
  }

  /** Impala-layout INT96 timestamp: little-endian 8-byte nanos-of-day +
    * 4-byte Julian day number → µs since the Unix epoch.
    */
  private def int96ToMicros(bytes: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    val JulianUnixEpoch = 2440588L
    (julianDay - JulianUnixEpoch) * 86400L * 1000000L + nanosOfDay / 1000L
  }
}
