package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Data inlining (DuckLake spec): appends at or below `inlineRowLimit`
  * live as JSON rows in the catalog — zero object-store round trips for
  * trickle inserts — with full snapshot semantics, and are flushed into
  * parquet by flushInlined / Replace / compaction.
  */
class InlineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val root = Files.createTempDirectory("ducklake-inline").toString
  private lazy val lake = new DuckLake(spark, s"$root/meta", s"$root/data",
    inlineRowLimit = 10)

  override def afterAll(): Unit = { lake.close(); spark.stop() }

  private def dataFileCount(tbl: String): Long =
    lake.listFilesDF.filter(col("table_name") === tbl).count()

  test("small appends inline into the catalog; reads union them with file rows") {
    import spark.implicits._
    lake.createTableAs((1L to 100L).map(i => (i, s"r$i", i * 1.5)).toDF("k", "s", "v")
      .coalesce(1), "main.inl")
    val filesAfterCreate = dataFileCount("inl")
    lake.insertInto(Seq((101L, "small", 5.0), (102L, "tiny", 6.0)).toDF("k", "s", "v"),
      "main.inl")
    // no new data file — the rows are inlined
    assert(dataFileCount("inl") == filesAfterCreate)
    val got = lake.table("main.inl")
    assert(got.count() == 102)
    assert(got.filter(col("k") > 100).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((101L, "small"), (102L, "tiny")))
    // snapshot semantics: pre-append snapshot doesn't see them
    assert(lake.table("main.inl", Some(lake.currentSnapshot - 1)).count() == 100)
  }

  test("appends above the limit write files as usual") {
    import spark.implicits._
    val before = dataFileCount("inl")
    lake.insertInto((200L to 250L).map(i => (i, s"r$i", 1.0)).toDF("k", "s", "v")
      .coalesce(1), "main.inl")
    assert(dataFileCount("inl") == before + 1)
    assert(lake.table("main.inl").count() == 153)
  }

  test("deleteWhere ends matching inlined rows in the same snapshot as file deletes") {
    lake.deleteWhere("main.inl", col("k") === 101 || col("k") === 50)
    val got = lake.table("main.inl")
    assert(got.filter(col("k").isin(101, 50)).count() == 0)
    assert(got.count() == 151)
    // time travel sees them again
    assert(lake.table("main.inl", Some(lake.currentSnapshot - 1))
      .filter(col("k").isin(101, 50)).count() == 2)
  }

  test("flushInlined moves rows to a parquet file atomically") {
    import spark.implicits._
    val before = dataFileCount("inl")
    val preFlush = lake.currentSnapshot
    lake.flushInlined("main.inl")
    assert(dataFileCount("inl") == before + 1)
    assert(lake.table("main.inl").count() == 151) // no dupes, no loss
    assert(lake.store.getInlinedRows(
      lake.store.getTableByName(0, "inl", lake.currentSnapshot).get.tableId,
      lake.currentSnapshot).isEmpty)
    // pre-flush snapshot still reads the inlined form
    assert(lake.table("main.inl", Some(preFlush)).count() == 151)
    // idempotent
    lake.flushInlined("main.inl")
    assert(dataFileCount("inl") == before + 1)
  }

  test("rename after inlining: epoch-aware JSON parse projects by column_id") {
    import spark.implicits._
    lake.createTableAs(Seq((1L, "x")).toDF("old_name", "v").coalesce(1), "main.inlren")
    lake.insertInto(Seq((2L, "y")).toDF("old_name", "v"), "main.inlren") // inlined
    lake.renameColumn("main.inlren", "old_name", "neu")
    val got = lake.table("main.inlren").orderBy("neu").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // and SQL UPDATE auto-flushes inlined rows before the rewrite
    spark.conf.set("spark.sql.catalog.inlake",
      classOf[graft.lake.connector.DuckLakeSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.inlake.metaDb", s"$root/meta")
    spark.conf.set("spark.sql.catalog.inlake.dataPath", s"$root/data")
    spark.sql("UPDATE inlake.main.inlren SET v = 'upd' WHERE neu = 2")
    val after = lake.table("main.inlren").orderBy("neu").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == Seq((1L, "x"), (2L, "upd")))
  }

  test("compaction flushes inlined rows (Replace ends them atomically)") {
    import spark.implicits._
    lake.createTableAs((1L to 20L).map(i => (i, i * 2.0)).toDF("k", "v")
      .coalesce(1), "main.inlc")
    lake.insertInto(Seq((21L, 42.0)).toDF("k", "v"), "main.inlc") // inlined
    lake.compact("main.inlc")
    assert(lake.table("main.inlc").count() == 21)
    assert(dataFileCount("inlc") == 1)
    val tid = lake.store.getTableByName(0, "inlc", lake.currentSnapshot).get.tableId
    assert(lake.store.getInlinedRows(tid, lake.currentSnapshot).isEmpty)
  }
}
