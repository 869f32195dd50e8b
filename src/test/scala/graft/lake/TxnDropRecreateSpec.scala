package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Drop-and-recreate a schema inside ONE transaction, with a table of a
  * DIFFERENT column type under the same name — the reads must bind to the
  * new table's schema (corpus: catalog/schema.test date block).
  */
class TxnDropRecreateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", Files.createTempDirectory("tdr-wh").toString)
    .config("spark.sql.leafNodeDefaultParallelism", "1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("drop schema cascade + recreate with different type in one txn") {
    val dir = Files.createTempDirectory("tdr").toString
    val lake = new DuckLake(spark, s"$dir/meta", s"$dir/data")
    graft.lake.connector.DuckLakeSparkCatalog.adopt(lake)
    spark.conf.set("spark.sql.catalog.tdr",
      classOf[graft.lake.connector.DuckLakeSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.tdr.metaDb", lake.metaDbPath)
    spark.conf.set("spark.sql.catalog.tdr.dataPath", lake.dataPath)

    spark.sql("CREATE SCHEMA tdr.s1")
    spark.sql("CREATE TABLE tdr.s1.tbl(i INT)")
    spark.sql("INSERT INTO tdr.s1.tbl VALUES (42)")
    assert(spark.sql("SELECT * FROM tdr.s1.tbl").head.getInt(0) == 42)

    lake.beginTransaction()
    spark.sql("DROP SCHEMA tdr.s1 CASCADE")
    spark.sql("CREATE SCHEMA tdr.s1")
    spark.sql("CREATE TABLE tdr.s1.tbl(a DATE)")
    spark.sql("INSERT INTO tdr.s1.tbl VALUES (DATE '1992-01-01')")
    val got = spark.sql("SELECT * FROM tdr.s1.tbl").collect()
    assert(got.map(_.get(0).toString).toSeq == Seq("1992-01-01"))
    lake.commitTransaction()
    assert(spark.sql("SELECT * FROM tdr.s1.tbl").head.get(0).toString == "1992-01-01")
  }
}
