package graft.lake

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Regression tests for round-5 review findings: catalog-upgrade
  * migration, shared-database Derby lifecycle, redefinition field ids and
  * commit-audit hygiene.
  */
class ReviewRegressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshRoot(): String =
    Files.createTempDirectory("ducklake-rr").toString

  test("pre-defaults catalogs migrate: default_value columns appear on reopen") {
    import spark.implicits._
    val root = freshRoot()
    val lake1 = new DuckLake(spark, s"$root/meta", s"$root/data")
    lake1.createTableAs(Seq((1L, "a")).toDF("k", "v").coalesce(1), "main.m1")
    lake1.close()
    // simulate a catalog bootstrapped BEFORE the full default surface
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = DriverManager.getConnection(s"jdbc:derby:$root/meta")
    val st = conn.createStatement()
    try {
      st.executeUpdate("ALTER TABLE ducklake_column DROP COLUMN default_value")
      st.executeUpdate("ALTER TABLE ducklake_column DROP COLUMN default_value_type")
      st.executeUpdate("ALTER TABLE ducklake_column DROP COLUMN default_value_dialect")
    } finally { st.close(); conn.close() }
    try { DriverManager.getConnection(s"jdbc:derby:$root/meta;shutdown=true"); () }
    catch { case _: java.sql.SQLException => () }
    // reopening migrates and every read/write keeps working
    val lake2 = new DuckLake(spark, s"$root/meta", s"$root/data")
    try {
      assert(lake2.table("main.m1").count() == 1)
      lake2.insertInto(Seq((2L, "b")).toDF("k", "v").coalesce(1), "main.m1")
      assert(lake2.table("main.m1").count() == 2)
      lake2.addColumn("main.m1", "z", "int32", Some("7"))
      assert(lake2.columnDefaultsOf("main.m1").get("z").contains("7"))
    } finally lake2.close()
  }

  test("closing one METADATA_SCHEMA catalog leaves its shared-db sibling usable") {
    import spark.implicits._
    val root = freshRoot()
    val a = new DuckLake(spark, s"$root/meta", s"$root/data_a",
      metadataSchema = Some("s_a"))
    val b = new DuckLake(spark, s"$root/meta", s"$root/data_b",
      metadataSchema = Some("s_b"))
    try {
      a.createTableAs(Seq(1L).toDF("x").coalesce(1), "main.ta")
      b.createTableAs(Seq((1L, 2L)).toDF("x", "y").coalesce(1), "main.tb")
      a.close() // must NOT shut the shared database down
      b.insertInto(Seq((3L, 4L)).toDF("x", "y").coalesce(1), "main.tb")
      assert(b.table("main.tb").count() == 2)
    } finally b.close()
  }

  test("CREATE OR REPLACE writes field ids matching the redefined column ids") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new DuckLake(spark, s"$root/meta", s"$root/data")
    try {
      lake.createTableAs(Seq((1L, "a")).toDF("k", "v").coalesce(1), "main.r1")
      lake.createTableAs(Seq((2L, "b")).toDF("k", "v").coalesce(1), "main.r1") // replace
      val snap = lake.currentSnapshot
      val sch = lake.store.getSchemaByName("main", snap).get
      val tbl = lake.store.getTableByName(sch.schemaId, "r1", snap).get
      val want = lake.store.getTableColumns(tbl.tableId, snap)
        .map(c => c.name -> c.columnId).toMap
      assert(want.values.min > 2, "replace must have assigned fresh ids")
      val f = lake.store.getDataFiles(tbl.tableId, snap).head
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$root/data/main/r1/${f.path}"),
        spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        r.getFooter.getFileMetaData.getSchema.getFields.asScala.foreach { fld =>
          assert(Option(fld.getId).isDefined)
          assert(want(fld.getName) == fld.getId.intValue.toLong)
        }
      } finally r.close()
    } finally lake.close()
  }

  test("aborted COMMIT discards pending commit audit info") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new DuckLake(spark, s"$root/meta", s"$root/data")
    try {
      lake.createTableAs(Seq(1L).toDF("x").coalesce(1), "main.ci")
      lake.beginTransaction()
      lake.insertInto(Seq(2L).toDF("x").coalesce(1), "main.ci")
      lake.store.setCommitMessage(Some("alice"), Some("doomed"), None)
      lake.abortTransaction()
      intercept[DuckLakeException](lake.commitTransaction())
      // the next unrelated commit must NOT carry alice/doomed
      lake.insertInto(Seq(3L).toDF("x").coalesce(1), "main.ci")
      val last = lake.store.snapshotsWithChanges.last
      assert(last._5.isEmpty && last._6.isEmpty,
        s"stale audit info leaked onto snapshot ${last._1}")
    } finally lake.close()
  }
}
