package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** File adoption (`addFiles` ≙ the reference's `ducklake_add_data_files`,
  * tests/sqllogictests/sql/add_files/): parquet written by OUTSIDE writers
  * registers without a rewrite, under a duplicate-eliminated name mapping —
  * column order is irrelevant, types promote along the lattice, hive
  * `key=value` path segments satisfy path-partitioned columns, and the
  * whole thing stays consistent under rename / time travel / deletes.
  */
class AddFilesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val root = Files.createTempDirectory("dladd-add").toString
  private lazy val lake = new DuckLake(spark, s"$root/meta", s"$root/data")

  override def afterAll(): Unit = { lake.close(); spark.stop() }

  import spark.implicits._

  private var n = 0
  private def ext(df: org.apache.spark.sql.DataFrame): String = {
    n += 1
    val dir = s"$root/ext$n"
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("adopt files in place; reversed column order maps by name; mappings dedupe") {
    lake.createTableAs(Seq((1, "a"), (2, "b")).toDF("col1", "col2").coalesce(1), "main.adopt")
    val f1 = ext(Seq((3, "c")).toDF("col1", "col2"))
    val f2 = ext(Seq(("d", 4)).toDF("col2", "col1")) // reversed order
    lake.addFiles("main.adopt", Seq(f1, f2))
    assert(lake.table("main.adopt").orderBy("col1").collect().map(r =>
      (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    // by-name resolution is order-independent -> ONE mapping for both
    // files (reference asserts COUNT(ducklake_column_mapping) = 1)
    val tid = lake.store.getSchemaByName("main", lake.currentSnapshot)
      .flatMap(s => lake.store.getTableByName(s.schemaId, "adopt", lake.currentSnapshot))
      .get.tableId
    assert(lake.store.countColumnMappings(tid) == 1)
    // no data was copied: adopted rows still live under the external dir
    assert(lake.listFilesDF.filter(col("table_name") === "adopt")
      .filter(col("path").contains("/ext")).count() == 2)
  }

  test("missing column: rejected without allowMissing, NULL-filled with it") {
    lake.createTableAs(Seq((1, "x")).toDF("i", "j").coalesce(1), "main.miss")
    val f = ext(Seq(Tuple1(2)).toDF("i"))
    val e = intercept[InvalidConfigException](lake.addFiles("main.miss", Seq(f)))
    assert(e.getMessage.contains("\"j\"") && e.getMessage.contains("not found in file"))
    lake.addFiles("main.miss", Seq(f), allowMissing = true)
    assert(lake.table("main.miss").filter(col("i") === 2)
      .select("j").collect().head.isNullAt(0))
  }

  test("extra column: rejected without ignoreExtraColumns, skipped with it") {
    lake.createTableAs(Seq((1, "x")).toDF("i", "j").coalesce(1), "main.extra")
    val f = ext(Seq((2, "y", 9.5)).toDF("i", "j", "surplus"))
    val e = intercept[InvalidConfigException](lake.addFiles("main.extra", Seq(f)))
    assert(e.getMessage.contains("\"surplus\"") && e.getMessage.contains("exists in file"))
    lake.addFiles("main.extra", Seq(f), ignoreExtraColumns = true)
    assert(lake.table("main.extra").orderBy("i").select("i", "j").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "x"), (2, "y")))
  }

  test("type check: narrowing rejected, widening promoted on read") {
    lake.createTableAs(Seq(Tuple1(1)).toDF("v").coalesce(1), "main.typed") // int32
    val wide = ext(Seq(Tuple1(5L)).toDF("v")) // int64 into int32: rejected
    val e = intercept[UnsupportedTypeException](lake.addFiles("main.typed", Seq(wide)))
    assert(e.getMessage.contains("int64") && e.getMessage.contains("int32"))
    // int32 file into an int64 table: accepted, cast on read
    lake.createTableAs(Seq(Tuple1(1L)).toDF("v").coalesce(1), "main.typed64")
    val narrow = ext(Seq(Tuple1(7)).toDF("v"))
    lake.addFiles("main.typed64", Seq(narrow))
    assert(lake.table("main.typed64").orderBy("v").as[Long].collect().toSeq == Seq(1L, 7L))
  }

  test("hive dirs: values from the path, stats prune to matching files") {
    lake.createTableAs( // Option[_] keeps the partition columns nullable
      Seq((Option(1), Option(10), "seed")).toDF("part_key", "part_key2", "val")
        .coalesce(1), "main.hive")
    Seq((1, 10, "hello"), (2, 10, "world"), (2, 20, "abc"))
      .toDF("part_key", "part_key2", "val")
      .write.mode("overwrite").partitionBy("part_key", "part_key2")
      .parquet(s"$root/hivedir")
    // hive_partitioning off: the columns are genuinely missing
    val e = intercept[InvalidConfigException](lake.addFiles("main.hive",
      Seq(s"$root/hivedir"), hivePartitioning = Some(false)))
    assert(e.getMessage.contains("allowMissing"))
    lake.addFiles("main.hive", Seq(s"$root/hivedir")) // auto-detected
    assert(lake.table("main.hive").orderBy("part_key", "part_key2", "val").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1, 10, "hello"), (1, 10, "seed"), (2, 10, "world"), (2, 20, "abc")))
    // point-range synthetic stats: part_key=1 scan touches 2 of 4 files
    lake.table("main.hive", None, Seq(EqualTo("part_key", 1))).collect()
    assert(lake.lastScanFileCount == 2)
  }

  test("rename before and after adoption keeps resolving (column_id mapping)") {
    lake.createTableAs(Seq((1, "a")).toDF("old_name", "v").coalesce(1), "main.ren")
    val f1 = ext(Seq((2, "b")).toDF("old_name", "v"))
    lake.addFiles("main.ren", Seq(f1))
    lake.renameColumn("main.ren", "old_name", "new_name")
    // the adopted file still resolves through its mapping after the rename
    assert(lake.table("main.ren").orderBy("new_name").select("new_name", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a"), (2, "b")))
    // a file written by an outside writer AFTER the rename maps the new name
    val f2 = ext(Seq((3, "c")).toDF("new_name", "v"))
    lake.addFiles("main.ren", Seq(f2))
    assert(lake.table("main.ren").count() == 3)
  }

  test("adoption is snapshot-versioned: time travel, rollback, CDC") {
    lake.createTableAs(Seq((1, "a")).toDF("k", "v").coalesce(1), "main.tt")
    val before = lake.currentSnapshot
    val f = ext(Seq((2, "b")).toDF("k", "v"))
    val added = lake.addFiles("main.tt", Seq(f))
    assert(lake.table("main.tt", Some(before)).count() == 1)
    assert(lake.table("main.tt").count() == 2)
    // CDC reports the adopted rows as inserts at the add snapshot
    val changes = lake.tableChanges("main.tt", before, added)
      .select("k", "change_type", "snapshot_id").collect()
    assert(changes.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((2, "insert", added)))
    lake.rollbackTo("main.tt", before)
    assert(lake.table("main.tt").count() == 1)
  }

  test("MOR deletes apply to adopted files through the mapping projection") {
    lake.createTableAs(Seq((1, "a")).toDF("k", "v").coalesce(1), "main.moradopt")
    val f = ext(Seq((2, "b"), (3, "c"), (4, "d")).toDF("k", "v"))
    lake.addFiles("main.moradopt", Seq(f))
    lake.deleteWhere("main.moradopt", col("k") === 3)
    assert(lake.table("main.moradopt").orderBy("k").select("k").as[Int].collect()
      .toSeq == Seq(1, 2, 4))
    // the adopted file itself was NOT rewritten by the MOR delete
    assert(lake.listFilesDF.filter(col("table_name") === "moradopt")
      .filter(col("path").contains("/ext")).count() == 1)
  }

  test("NOT NULL columns: missing or null-carrying files are rejected") {
    // Seq.toDF marks primitive columns non-nullable -> k is NOT NULL
    lake.createTableAs(Seq((1, "a")).toDF("k", "v").coalesce(1), "main.nn")
    val missing = ext(Seq(Tuple1("b")).toDF("v"))
    val e1 = intercept[InvalidConfigException](
      lake.addFiles("main.nn", Seq(missing), allowMissing = true))
    assert(e1.getMessage.contains("NOT NULL"))
    val withNulls = ext(Seq((Some(2), "b"), (None, "c")).toDF("k", "v"))
    val e2 = intercept[InvalidConfigException](lake.addFiles("main.nn", Seq(withNulls)))
    assert(e2.getMessage.contains("null values"))
  }

  test("nonexistent path fails loudly; CALL surface registers a snapshot") {
    lake.createTableAs(Seq((1, "a")).toDF("k", "v").coalesce(1), "main.proc")
    val e = intercept[InvalidConfigException](
      lake.addFiles("main.proc", Seq(s"$root/nope.parquet")))
    assert(e.getMessage.contains("Failed to add data files"))
    spark.conf.set("spark.sql.catalog.dladd",
      classOf[graft.lake.connector.DuckLakeSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.dladd.metaDb", lake.metaDbPath)
    spark.conf.set("spark.sql.catalog.dladd.dataPath", lake.dataPath)
    val f = ext(Seq((2, "b")).toDF("k", "v"))
    spark.sql(s"CALL dladd.system.add_files('main.proc', '$f')").collect()
    assert(spark.sql("SELECT * FROM dladd.main.proc").count() == 2)
  }
}
