package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contract test of the [[MetadataBackend.supportsLateral]] dialect axis
  * (r14 verdict task 6): the CDC previous-delete pairing is generated in
  * two SQL forms from ONE site — the reference's LEFT JOIN LATERAL
  * (src/metadata_provider.rs:109-126) for network backends and the ANSI
  * correlated-MAX rewrite for Derby — and this spec pins the rewrite's
  * row-identity against an independently known delete-generation chain,
  * plus the structural agreement of the two forms (identical SELECT
  * list / placeholders / ordering, differing only in the prev-lookup
  * join). A future Postgres backend therefore flips a TESTED flag.
  */
class BackendDialectSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val root = Files.createTempDirectory("dl-dialect").toString

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("correlated-MAX rewrite pairs each delete file with its newest predecessor") {
    import spark.implicits._
    val lake = new DuckLake(spark, "memory:dialect_spec", s"$root/data")
    lake.createTableAs(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1),
      "main.gen")
    val tid = lake.store.getSchemaByName("main", lake.currentSnapshot)
      .flatMap(s => lake.store.getTableByName(s.schemaId, "gen", lake.currentSnapshot))
      .get.tableId
    val s0 = lake.currentSnapshot
    // three successive MOR deletes against the SAME data file: each
    // commit writes a delete file superseding the previous generation
    lake.deleteWhere("main.gen", col("id") === 1L)
    val s1 = lake.currentSnapshot
    lake.deleteWhere("main.gen", col("id") === 2L)
    val s2 = lake.currentSnapshot
    lake.deleteWhere("main.gen", col("id") === 3L)
    val s3 = lake.currentSnapshot
    assert(s0 < s1 && s1 < s2 && s2 < s3)

    val rows = lake.store.getDeleteFilesAddedBetween(tid, s0, s3)
      .collect { case (Some(d), prev, _) => (d, prev) }
      .sortBy(_._1.beginSnapshot)
    assert(rows.size == 3, s"expected 3 delete-file generations, got ${rows.size}")
    // row-identity of the pairing: generation k's predecessor IS
    // generation k−1 (id-level equality, not just counts)
    assert(rows(0)._2.isEmpty, "first generation has no predecessor")
    assert(rows(1)._2.map(_.deleteFileId).contains(rows(0)._1.deleteFileId))
    assert(rows(2)._2.map(_.deleteFileId).contains(rows(1)._1.deleteFileId))
    // a sub-range query pairs against the newest delete BEFORE the range
    val tail = lake.store.getDeleteFilesAddedBetween(tid, s2, s3)
      .collect { case (Some(d), prev, _) => (d, prev) }
    assert(tail.size == 1)
    assert(tail.head._2.map(_.deleteFileId).contains(rows(1)._1.deleteFileId))
    // cumulative MOR semantics stayed intact through the new single-query
    // pairing (each generation's delete file carries all prior positions)
    assert(lake.table("main.gen").count() == 97L)
    lake.close()
  }

  test("the LATERAL form is selected by the capability flag and mirrors the rewrite") {
    val lake = new DuckLake(spark, "memory:dialect_spec2", s"$root/data2")
    try {
      val lateral = lake.store.newDeletesWithPrevSql(lateral = true)
      val rewrite = lake.store.newDeletesWithPrevSql(lateral = false)
      assert(lateral.contains("LEFT JOIN LATERAL"))
      assert(!rewrite.contains("LATERAL"))
      // both forms project the identical column list in the identical
      // order and bind the identical placeholders — a backend flipping
      // the flag changes ONLY the prev-lookup join
      def head(sql: String) = sql.linesIterator.next()
      assert(head(lateral) == head(rewrite))
      assert(lateral.count(_ == '?') == 3 && rewrite.count(_ == '?') == 3)
      assert(lateral.endsWith("ORDER BY d.begin_snapshot, d.delete_file_id") &&
        rewrite.endsWith("ORDER BY d.begin_snapshot, d.delete_file_id"))
      // Derby's backends both declare the flag off
      assert(!new DerbyFileBackend(s"$root/x").supportsLateral)
      assert(!new DerbyMemoryBackend("y").supportsLateral)
    } finally lake.close()
  }
}
