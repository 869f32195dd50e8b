package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** NOT NULL enforcement on every write path (reference:
  * tests/sqllogictests/sql/constraints/not_null.test): inserts with nulls
  * are rejected from footer null counts, inlined rows are checked in the
  * catalog commit, ADD COLUMN NOT NULL needs a default, and SET NOT NULL
  * validates the existing data before flipping the constraint.
  */
class ConstraintSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val root = Files.createTempDirectory("dlcons-nn").toString
  private lazy val lake = new DuckLake(spark, s"$root/meta", s"$root/data",
    inlineRowLimit = 0)

  override def afterAll(): Unit = { lake.close(); spark.stop() }

  import spark.implicits._

  test("insert with nulls into a NOT NULL column is rejected; clean insert passes") {
    // Seq.toDF marks primitive i non-nullable -> catalog NOT NULL
    lake.createTableAs(Seq((1, "a")).toDF("i", "j").coalesce(1), "main.nn1")
    val e = intercept[ConstraintViolationException] {
      lake.insertInto(Seq((Some(2), "b"), (None, "c")).toDF("i", "j").coalesce(1), "main.nn1")
    }
    assert(e.getMessage.contains("NOT NULL constraint failed") &&
      e.getMessage.contains("i"))
    // the failed commit left no rows and no orphan visible files
    assert(lake.table("main.nn1").count() == 1)
    lake.insertInto(Seq((Some(2), "b")).toDF("i", "j").coalesce(1), "main.nn1")
    assert(lake.table("main.nn1").count() == 2)
  }

  test("inlined appends enforce NOT NULL in the catalog commit") {
    val root2 = Files.createTempDirectory("dlcons-nn-inl").toString
    val inl = new DuckLake(spark, s"$root2/meta", s"$root2/data", inlineRowLimit = 16)
    try {
      inl.createTableAs(Seq((1, "a")).toDF("i", "j").coalesce(1), "main.nni")
      val e = intercept[ConstraintViolationException] {
        inl.insertInto(Seq((None: Option[Int], "b")).toDF("i", "j"), "main.nni")
      }
      assert(e.getMessage.contains("NOT NULL"))
      assert(inl.table("main.nni").count() == 1)
    } finally inl.close()
  }

  test("ADD COLUMN NOT NULL requires a default; with one it is accepted") {
    lake.createTableAs(Seq((1, "a")).toDF("i", "j").coalesce(1), "main.nn2")
    val e = intercept[ConstraintViolationException] {
      lake.addColumn("main.nn2", "k", "int32", None, nullable = false)
    }
    assert(e.getMessage.contains("default"))
    lake.addColumn("main.nn2", "k", "int32", Some("7"), nullable = false)
    assert(lake.table("main.nn2").select("k").as[Int].collect().toSeq == Seq(7))
    // and the new NOT NULL column now rejects null inserts
    intercept[ConstraintViolationException] {
      lake.insertInto(Seq((2, "b", None: Option[Int])).toDF("i", "j", "k").coalesce(1),
        "main.nn2")
    }
  }

  test("SET NOT NULL validates existing data; DROP NOT NULL re-allows nulls") {
    lake.createTableAs(
      Seq((Some(1), "a"), (None, "b")).toDF("i", "j").coalesce(1), "main.nn3")
    val e = intercept[ConstraintViolationException](lake.setNotNull("main.nn3", "i"))
    assert(e.getMessage.contains("contains null values"))
    // delete the offending row, then the constraint can be set
    lake.deleteWhere("main.nn3", col("i").isNull)
    lake.setNotNull("main.nn3", "i")
    intercept[ConstraintViolationException] {
      lake.insertInto(Seq((None: Option[Int], "c")).toDF("i", "j").coalesce(1), "main.nn3")
    }
    lake.dropNotNull("main.nn3", "i")
    lake.insertInto(Seq((None: Option[Int], "c")).toDF("i", "j").coalesce(1), "main.nn3")
    assert(lake.table("main.nn3").count() == 2)
  }

  test("SQL surface: ALTER DROP NOT NULL through the DSv2 catalog") {
    // Spark's analyzer forbids nullable->non-nullable ALTERs on DSv2
    // tables outright, so SET NOT NULL is API-only (lake.setNotNull);
    // the relaxing direction round-trips through SQL
    spark.conf.set("spark.sql.catalog.dlcons",
      classOf[graft.lake.connector.DuckLakeSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.dlcons.metaDb", lake.metaDbPath)
    spark.conf.set("spark.sql.catalog.dlcons.dataPath", lake.dataPath)
    lake.createTableAs(Seq((Some(1), "a")).toDF("i", "j").coalesce(1), "main.nn4")
    lake.setNotNull("main.nn4", "i")
    val e = intercept[Exception] {
      lake.insertInto(Seq((None: Option[Int], "b")).toDF("i", "j").coalesce(1), "main.nn4")
    }
    assert(e.getMessage.contains("NOT NULL"))
    // DESCRIBE-visible: the DSv2 schema reflects the constraint
    assert(!spark.table("dlcons.main.nn4").schema("i").nullable)
    spark.sql("ALTER TABLE dlcons.main.nn4 ALTER COLUMN i DROP NOT NULL")
    lake.insertInto(Seq((None: Option[Int], "b")).toDF("i", "j").coalesce(1), "main.nn4")
    assert(lake.table("main.nn4").count() == 2)
  }
}
