package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Cross-table atomic transactions: the multi-table commit a SQL-backed
  * catalog affords — all tables' new rows appear at ONE snapshot, and a
  * failure anywhere rolls back everything (catalog rows by SQL rollback,
  * moved files by explicit cleanup).
  */
class TransactionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val root = Files.createTempDirectory("ducklake-txn").toString
  private lazy val lake = new DuckLake(spark, s"$root/meta", s"$root/data")

  override def afterAll(): Unit = { lake.close(); spark.stop() }

  test("two tables commit in one snapshot") {
    import spark.implicits._
    val before = lake.currentSnapshot
    val snap = lake.transaction { tx =>
      tx.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), "main.orders_tx")
      tx.write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amt").coalesce(1), "main.items_tx")
    }
    assert(snap == before + 1) // ONE snapshot for both tables
    assert(lake.table("main.orders_tx").count() == 2)
    assert(lake.table("main.items_tx").count() == 2)
    // neither table existed at the prior snapshot
    assertThrows[DuckLakeException](lake.table("main.orders_tx", Some(before)))
  }

  test("append + replace to different tables, atomically") {
    import spark.implicits._
    val snap = lake.transaction { tx =>
      tx.write(Seq((3L, "c")).toDF("k", "v").coalesce(1), "main.orders_tx")
      tx.write(Seq((9L, 99.0)).toDF("k", "amt").coalesce(1), "main.items_tx",
        WriteMode.Replace)
    }
    assert(lake.table("main.orders_tx").count() == 3)
    assert(lake.table("main.items_tx").collect().map(_.getLong(0)).toSeq == Seq(9L))
    // time travel to just before: old state of both
    assert(lake.table("main.items_tx", Some(snap - 1)).count() == 2)
  }

  test("failure anywhere rolls back every table and cleans moved files") {
    import spark.implicits._
    val before = lake.currentSnapshot
    val filesBefore = lake.listFilesDF.count()
    intercept[UnsupportedTypeException] {
      lake.transaction { tx =>
        tx.write(Seq((4L, "d")).toDF("k", "v").coalesce(1), "main.orders_tx")
        // int64 -> varchar type change: registration fails at commit
        tx.write(Seq(("oops", "x")).toDF("k", "v").coalesce(1), "main.orders_tx")
      }
    }
    assert(lake.currentSnapshot == before, "no snapshot must be committed")
    assert(lake.table("main.orders_tx").count() == 3, "first write rolled back too")
    assert(lake.listFilesDF.count() == filesBefore)
    // no orphan files on disk (1 from each successful commit)
    val dir = new java.io.File(s"$root/data/main/orders_tx")
    assert(dir.listFiles().count(_.getName.endsWith(".parquet")) == 2)
  }
}
