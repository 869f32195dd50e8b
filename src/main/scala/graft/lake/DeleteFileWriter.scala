package graft.lake

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.util.SerializableConfiguration

import graft.lake.crypto.GraftCryptoFactory

/** Distributed writer for MOR positional delete files: the merged
  * `(data_file_id, pos)` set stays a DataFrame end to end — shuffled by
  * file id, sorted, and streamed into one Iceberg-style
  * `(file_path, pos)` parquet per data file FROM EXECUTOR TASKS. The
  * driver only ever holds the O(files) registration rows, so
  * `DELETE WHERE <half the table>` at 100 TB costs the cluster a shuffle,
  * not the driver its heap (the previous implementation collected every
  * position to the driver; reference src/table.rs:494-511 does the same
  * and shares the cliff).
  */
private[lake] object DeleteFileWriter {

  private def deleteSchema: MessageType = Types.buildMessage()
    .addField(Types.optional(PrimitiveTypeName.BINARY)
      .as(LogicalTypeAnnotation.stringType()).named("file_path"))
    .addField(Types.optional(PrimitiveTypeName.INT64).named("pos"))
    .named("spark_schema")

  /** Write one delete parquet per distinct `__fid` of `positions`
    * (columns `__fid`, `pos`; duplicates allowed — deduped in-stream) into
    * `destDir`, encrypting each with a fresh key when `encrypted`.
    * Returns (data_file_id → registration); file sizes are left 0 as in
    * the driver-side writer (delete files are exempt from size stats).
    */
  def writeDistributed(spark: SparkSession, positions: DataFrame,
      pathByFid: Map[Long, String], destDir: String,
      hconf: org.apache.hadoop.conf.Configuration,
      encrypted: Boolean): Seq[(Long, FileToRegister)] = {
    val conf = new SerializableConfiguration(hconf)
    val paths = spark.sparkContext.broadcast(pathByFid)
    import spark.implicits._
    positions
      .select(col("__fid").cast("long"), col("pos").cast("long"))
      .repartition(col("__fid"))
      .sortWithinPartitions("__fid", "pos")
      .as[(Long, Long)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, String, Long)]
        val msgType = deleteSchema
        val gf = new SimpleGroupFactory(msgType)
        val taskFs = new Path(destDir).getFileSystem(conf.value)
        var cur = Long.MinValue
        var lastPos = Long.MinValue
        var w: ParquetWriter[Group] = null
        var name: String = null
        var key: String = null
        var count = 0L
        def closeCurrent(): Unit = if (w != null) {
          w.close()
          val size = taskFs.getFileStatus(new Path(s"$destDir/$name")).getLen
          out += ((cur, name, count, key, size))
          w = null
        }
        it.foreach { case (fid, pos) =>
          if (fid != cur) {
            closeCurrent()
            cur = fid; lastPos = Long.MinValue; count = 0L
            // reference delete-file naming: ducklake-<uuid>-delete.parquet
            name = s"ducklake-${UUID.randomUUID()}-delete.parquet"
            key = if (encrypted) GraftCryptoFactory.newKeyB64() else null
            val b = ExampleParquetWriter.builder(new Path(s"$destDir/$name"))
              .withConf(conf.value).withType(msgType)
            if (key != null) b.withEncryption(GraftCryptoFactory.encryptionProps(key))
            w = b.build()
          }
          if (pos != lastPos) { // sorted input → adjacent duplicates
            val g = gf.newGroup()
            g.add("file_path", paths.value(fid))
            g.add("pos", pos)
            w.write(g)
            count += 1
            lastPos = pos
          }
        }
        closeCurrent()
        out.iterator
      }
      .collect().toSeq
      .sortBy(_._1)
      .map { case (fid, name, count, key, size) =>
        fid -> FileToRegister(name, count, size, 0L, Nil, Option(key))
      }
  }
}
