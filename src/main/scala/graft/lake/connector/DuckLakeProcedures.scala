package graft.lake.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.DuckLake

/** Maintenance stored procedures — `CALL ducklake.system.<proc>(…)`
  * (Spark 4 `ProcedureCatalog`): the SQL surface for the lake's
  * table-maintenance operations, mirroring the Iceberg-style procedure
  * catalog. Each returns its outcome as a one-row result via `LocalScan`
  * (no executors involved — these are catalog/driver operations whose
  * heavy lifting, where any, is ordinary distributed Spark inside the
  * lake facade).
  */
private[connector] object DuckLakeProcedures {

  private def param(name: String, dt: DataType, default: Option[String] = None) = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  private final case class ProcDef(name: String,
      params: Seq[ProcedureParameter], out: StructType,
      run: (DuckLake, InternalRow) => Seq[Any])

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString

  private val defs: Seq[ProcDef] = Seq(
    ProcDef("expire_snapshots",
      Seq(param("before_snapshot", LongType)),
      StructType(Seq(StructField("expired_count", IntegerType))),
      (lake, in) => Seq(lake.expireSnapshots(in.getLong(0)).size)),

    ProcDef("vacuum", Nil,
      StructType(Seq(StructField("deleted_files", IntegerType))),
      (lake, _) => Seq(lake.vacuum())),

    ProcDef("schedule_vacuum", Nil,
      StructType(Seq(StructField("scheduled_files", IntegerType))),
      (lake, _) => Seq(lake.scheduleVacuum())),

    ProcDef("purge_scheduled",
      Seq(param("retention_hours", IntegerType, Some("0"))),
      StructType(Seq(StructField("deleted_files", IntegerType))),
      (lake, in) => Seq(lake.purgeScheduled(
        java.time.Duration.ofHours(in.getInt(0).toLong)))),

    ProcDef("compact",
      Seq(param("table", StringType), param("num_files", IntegerType, Some("1"))),
      StructType(Seq(StructField("snapshot", LongType))),
      (lake, in) => Seq(lake.compact(str(in, 0), in.getInt(1)))),

    ProcDef("rewrite_files",
      Seq(param("table", StringType),
        param("min_delete_ratio", DoubleType, Some("0.1")),
        param("small_file_bytes", LongType, Some("0"))),
      StructType(Seq(StructField("snapshot", LongType))),
      (lake, in) => Seq(lake.rewriteFiles(str(in, 0), in.getDouble(1), in.getLong(2)))),

    ProcDef("rollback",
      Seq(param("table", StringType), param("snapshot", LongType)),
      StructType(Seq(StructField("new_snapshot", LongType))),
      (lake, in) => Seq(lake.rollbackTo(str(in, 0), in.getLong(1)))),

    ProcDef("clone_table",
      Seq(param("source", StringType), param("target", StringType)),
      StructType(Seq(StructField("snapshot", LongType))),
      (lake, in) => Seq(lake.cloneTable(str(in, 0), str(in, 1)))),

    ProcDef("tag_snapshot",
      Seq(param("tag", StringType), param("snapshot", LongType)),
      StructType(Seq(StructField("tagged_snapshot", LongType))),
      (lake, in) => { lake.tagSnapshot(str(in, 0), in.getLong(1)); Seq(in.getLong(1)) }),

    // reference: ducklake_add_data_files (tests/sqllogictests/sql/add_files/)
    ProcDef("add_files",
      Seq(param("table", StringType), param("path", StringType),
        param("allow_missing", BooleanType, Some("false")),
        param("ignore_extra_columns", BooleanType, Some("false"))),
      StructType(Seq(StructField("snapshot", LongType))),
      (lake, in) => Seq(lake.addFiles(str(in, 0), Seq(str(in, 1)),
        allowMissing = in.getBoolean(2), ignoreExtraColumns = in.getBoolean(3)))))

  /** Multi-row procedures (snapshot-count-sized results — driver-safe). */
  private val multiDefs: Seq[(String, Seq[ProcedureParameter], StructType,
      (DuckLake, InternalRow) => Seq[Seq[Any]])] = Seq(
    ("table_history",
      Seq(param("table", StringType)),
      StructType(Seq(StructField("snapshot_id", LongType),
        StructField("snapshot_time", TimestampNTZType),
        StructField("retained", BooleanType))),
      (lake, in) => lake.history(str(in, 0)).collect().toSeq.map { r =>
        Seq(r.getLong(0),
          Option(r.getAs[java.time.LocalDateTime](1))
            .map(t => t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
              + t.getNano / 1000L).orNull,
          r.getBoolean(2))
      }))

  def names: Array[Identifier] =
    (defs.map(_.name) ++ multiDefs.map(_._1))
      .map(n => Identifier.of(Array("system"), n)).toArray

  private def make(pname: String, params: Seq[ProcedureParameter],
      out: StructType, rows: (DuckLake, InternalRow) => Seq[Seq[Any]],
      lake: => DuckLake): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = s"DuckLake maintenance procedure $pname"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = pname
        override def description(): String = s"DuckLake maintenance procedure $pname"
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val out0 = rows(lake, input).map { vs =>
            new GenericInternalRow(vs.map {
              case s: String => UTF8String.fromString(s)
              case other     => other
            }.toArray): InternalRow
          }.toArray
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = out0
            override def readSchema(): StructType = out
          }).iterator()
        }
      }
    }

  def load(lake: => DuckLake, name: String): UnboundProcedure =
    defs.find(_.name == name) match {
      case Some(d) => make(d.name, d.params, d.out,
        (l, in) => Seq(d.run(l, in)), lake)
      case None =>
        val m = multiDefs.find(_._1 == name).getOrElse(
          throw new RuntimeException(s"unknown procedure: system.$name"))
        make(m._1, m._2, m._3, m._4, lake)
    }
}
