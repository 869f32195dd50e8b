package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The [[MetadataBackend]] seam, proven on the second backend (r13
  * verdict task 5): the full connector surface — CTAS, pushdown SELECT,
  * INSERT, time travel, MOR deletes — runs unchanged against an
  * in-memory metadata catalog selected by the `memory:<name>` path
  * scheme, and the backend's `drop=true` shutdown actually deallocates
  * the database (a re-open sees a FRESH catalog, unlike the on-disk
  * backend where close/re-open round-trips state).
  */
class MemoryBackendSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val root = Files.createTempDirectory("dl-membackend").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.dlmem",
      classOf[graft.lake.connector.DuckLakeSparkCatalog].getName)
    .config("spark.sql.catalog.dlmem.metaDb", "memory:dlmem_spec")
    .config("spark.sql.catalog.dlmem.dataPath", s"$root/data")
    .getOrCreate()

  private lazy val lake = {
    import spark.implicits._
    val l = new DuckLake(spark, "memory:dlmem_spec", s"$root/data")
    l.createTableAs(
      (1 to 100).map(i => (i.toLong, s"name_$i", i * 1.5))
        .toDF("id", "name", "amount").coalesce(1), "main.items")
    l
  }

  override def afterAll(): Unit = spark.stop()

  test("connector SQL surface runs on the in-memory backend") {
    lake // force fixture through the SAME memory db the catalog uses
    assert(spark.sql("SELECT count(*) FROM dlmem.main.items").head.getLong(0) == 100L)
    val got = spark.sql(
      "SELECT name FROM dlmem.main.items WHERE id <= 3 ORDER BY name")
    assert(got.collect().map(_.getString(0)).toSeq == Seq("name_1", "name_2", "name_3"))
  }

  test("writes + time travel on the in-memory backend") {
    lake
    val before = lake.currentSnapshot
    spark.sql("INSERT INTO dlmem.main.items VALUES (101, 'name_101', 5.0)")
    assert(spark.sql("SELECT count(*) FROM dlmem.main.items").head.getLong(0) == 101L)
    assert(lake.table("main.items", Some(before)).count() == 100L)
    spark.sql("CREATE TABLE dlmem.main.small AS SELECT id FROM dlmem.main.items WHERE id <= 5")
    assert(spark.sql("SELECT count(*) FROM dlmem.main.small").head.getLong(0) == 5L)
  }

  test("MOR delete on the in-memory backend") {
    lake
    lake.deleteWhere("main.items", org.apache.spark.sql.functions.col("id") === 7L)
    assert(spark.sql("SELECT count(*) FROM dlmem.main.items WHERE id = 7").head.getLong(0) == 0L)
  }

  test("memory backend shutdown deallocates; on-disk backend persists") {
    import spark.implicits._
    // memory: lone store → close drops the db → a re-open is FRESH
    val mem = new MetadataStore("memory:dlmem_droptest")
    val memSnap0 = mem.currentSnapshot
    mem.createSchema("s1")
    assert(mem.currentSnapshot > memSnap0)
    mem.close()
    val mem2 = new MetadataStore("memory:dlmem_droptest")
    try assert(mem2.getSchemaByName("s1", mem2.currentSnapshot).isEmpty,
      "drop=true shutdown must deallocate the in-memory database")
    finally mem2.close()

    // on-disk twin: the same sequence round-trips state
    val disk = new MetadataStore(s"$root/meta_droptest")
    disk.createSchema("s1")
    disk.close()
    val disk2 = new MetadataStore(s"$root/meta_droptest")
    try assert(disk2.getSchemaByName("s1", disk2.currentSnapshot).isDefined,
      "on-disk backend must persist across close/re-open")
    finally disk2.close()

    // refcount: two stores on one key — first close must NOT shut the
    // engine down under the second
    val a = new MetadataStore("memory:dlmem_shared")
    val b = new MetadataStore("memory:dlmem_shared")
    a.createSchema("shared_schema")
    a.close()
    try assert(b.getSchemaByName("shared_schema", b.currentSnapshot).isDefined,
      "closing one store must not drop the database under its sibling")
    finally b.close()
    val _ = spark // touch lazy to silence unused-import paths
  }
}
