package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Snapshot expiration + physical-file vacuum: the storage-reclamation
  * lifecycle (DuckLake `ducklake_expire_snapshots` /
  * `ducklake_cleanup_old_files` semantics) — Replace/compaction churn
  * must be reclaimable without touching live data.
  */
class MaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val root = Files.createTempDirectory("dlmnt-maint").toString
  private lazy val lake = new DuckLake(spark, s"$root/meta", s"$root/data")

  override def afterAll(): Unit = { lake.close(); spark.stop() }

  private def filesOnDisk(tbl: String): Set[String] =
    Option(new java.io.File(s"$root/data/main/$tbl").listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty)

  test("expire + vacuum reclaims replaced files; live data intact") {
    import spark.implicits._
    lake.createTableAs((1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1), "main.churn")
    val s1 = lake.currentSnapshot
    lake.insertInto((101 to 110).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1), "main.churn", WriteMode.Replace)
    val before = filesOnDisk("churn")
    assert(before.count(_.startsWith("ducklake-")) == 2) // replaced + live

    // nothing is reclaimable while s1 is retained (it still sees file 1)
    assert(lake.vacuum() == 0)
    assert(lake.table("main.churn", Some(s1)).count() == 100)

    val expired = lake.expireSnapshots(lake.currentSnapshot)
    assert(expired.contains(s1))
    // expired snapshot no longer resolves
    intercept[InvalidSnapshotException](lake.table("main.churn", Some(s1)))
    // now the replaced file is reclaimable
    assert(lake.vacuum() == 1)
    assert(filesOnDisk("churn").count(_.startsWith("ducklake-")) == 1)
    // live rows unaffected
    assert(lake.table("main.churn").collect().map(_.getLong(0)).sorted.toSeq ==
      (101L to 110L))
    // idempotent
    assert(lake.vacuum() == 0)
  }

  test("two-phase vacuum: schedule keeps bytes until the retention purge") {
    import spark.implicits._
    lake.createTableAs((1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1), "main.twophase")
    lake.insertInto((51 to 60).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .coalesce(1), "main.twophase", WriteMode.Replace)
    lake.expireSnapshots(lake.currentSnapshot)
    // phase 1 rides the expiry itself (DuckLake semantics): catalog rows
    // purge and the orphan is ALREADY scheduled — physical bytes stay
    assert(lake.scheduleVacuum() == 0)
    assert(filesOnDisk("twophase").count(_.startsWith("ducklake-")) == 2)
    // a long retention window defers the physical delete
    assert(lake.purgeScheduled(java.time.Duration.ofDays(7)) == 0)
    assert(filesOnDisk("twophase").count(_.startsWith("ducklake-")) == 2)
    // phase 2 at retention 0 deletes and unschedules
    assert(lake.purgeScheduled(java.time.Duration.ZERO) == 1)
    assert(filesOnDisk("twophase").count(_.startsWith("ducklake-")) == 1)
    assert(lake.purgeScheduled(java.time.Duration.ZERO) == 0) // idempotent
    assert(lake.table("main.twophase").count() == 10)
  }

  test("vacuum reclaims superseded delete files but keeps the current one") {
    import spark.implicits._
    lake.createTableAs((1 to 50).map(i => (i.toLong, i % 5)).toDF("k", "m")
      .coalesce(1), "main.mor_churn")
    lake.deleteWhere("main.mor_churn", col("m") === 0) // delete file A
    lake.deleteWhere("main.mor_churn", col("m") === 1) // delete file B supersedes A
    val delFilesBefore = filesOnDisk("mor_churn").count(_.endsWith("-delete.parquet"))
    assert(delFilesBefore == 2)
    lake.expireSnapshots(lake.currentSnapshot)
    assert(lake.vacuum() == 1) // file A only
    assert(filesOnDisk("mor_churn").count(_.endsWith("-delete.parquet")) == 1)
    // MOR read still correct: m in {0,1} gone
    assert(lake.table("main.mor_churn").count() == 30)
  }

  test("age-based expiration: expireSnapshotsOlderThan") {
    import spark.implicits._
    lake.createTableAs(Seq((1L, "a")).toDF("k", "v").coalesce(1), "main.aged")
    val s1 = lake.currentSnapshot
    lake.insertInto(Seq((2L, "b")).toDF("k", "v").coalesce(1), "main.aged")
    // nothing is old enough with an epoch-start cutoff
    assert(lake.expireSnapshotsOlderThan(new java.sql.Timestamp(0L)).isEmpty)
    // a far-future cutoff expires everything but the newest
    val expired = lake.expireSnapshotsOlderThan(
      java.sql.Timestamp.valueOf("2100-01-01 00:00:00"))
    assert(expired.contains(s1))
    assert(lake.store.minSnapshot == lake.currentSnapshot)
    assert(lake.table("main.aged").count() == 2)
  }

  test("prefix (LIKE 'p%') pushdown prunes files on string min/max") {
    import spark.implicits._
    import org.apache.spark.sql.sources.StringStartsWith
    lake.createTableAs(Seq(("alpha", 1), ("apple", 2)).toDF("s", "n")
      .coalesce(1), "main.prefixed")
    lake.insertInto(Seq(("melon", 3), ("mango", 4)).toDF("s", "n").coalesce(1),
      "main.prefixed")
    assert(lake.table("main.prefixed", None, Seq(StringStartsWith("s", "ap")))
      .filter(col("s").startsWith("ap")).count() == 1)
    assert(lake.lastScanFileCount == 1)
    // prefix between the two files' ranges -> nothing scanned
    lake.table("main.prefixed", None, Seq(StringStartsWith("s", "c"))).count()
    assert(lake.lastScanFileCount == 0)
    // prefix covering both -> both kept
    lake.table("main.prefixed", None, Seq(StringStartsWith("s", ""))).count()
    assert(lake.lastScanFileCount == 2)
  }

  test("catalog state survives lake close + reopen (Derby durability)") {
    import spark.implicits._
    val droot = Files.createTempDirectory("dlmnt-reopen").toString
    val first = new DuckLake(spark, s"$droot/meta", s"$droot/data", inlineRowLimit = 8)
    first.createTableAs((1L to 50L).map(i => (i, s"r$i")).toDF("k", "s")
      .coalesce(1), "main.durable", partitionBy = Nil)
    first.insertInto(Seq((51L, "inlined")).toDF("k", "s"), "main.durable") // inlined
    first.deleteWhere("main.durable", col("k") === 10L)
    first.createView("main.dview", "SELECT 1 AS one")
    val snapBefore = first.currentSnapshot
    first.close()
    val reopened = new DuckLake(spark, s"$droot/meta", s"$droot/data")
    try {
      assert(reopened.currentSnapshot == snapBefore)
      val t = reopened.table("main.durable")
      assert(t.count() == 50) // 50 file rows + 1 inlined - 1 deleted
      assert(t.filter(col("s") === "inlined").count() == 1)
      assert(reopened.view("main.dview").head.getInt(0) == 1)
      // time travel across the reopen: before the delete (and before the
      // view snapshot) all 51 rows were visible
      assert(reopened.table("main.durable", Some(snapBefore - 2)).count() == 51)
    } finally reopened.close()
  }

  test("history() lists every snapshot that touched a table, flagging expired ones") {
    import spark.implicits._
    lake.createTableAs(Seq((1L, "a")).toDF("k", "v").coalesce(1), "main.hist")
    val s1 = lake.currentSnapshot
    lake.insertInto(Seq((2L, "b")).toDF("k", "v").coalesce(1), "main.hist")
    val s2 = lake.currentSnapshot
    lake.deleteWhere("main.hist", col("k") === 1L)
    val s3 = lake.currentSnapshot
    val h = lake.history("main.hist").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(h.keySet == Set(s1, s2, s3))
    assert(h.values.forall(identity)) // all retained
    lake.expireSnapshots(s3)
    val h2 = lake.history("main.hist").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(h2(s3) && !h2(s1) && !h2(s2)) // expired ones flagged, still listed
  }

  test("compaction + expire + vacuum = full storage turnover") {
    import spark.implicits._
    lake.createTableAs((1 to 60).map(i => (i.toLong, s"r$i")).toDF("k", "s")
      .repartition(3), "main.compact_vac")
    lake.deleteWhere("main.compact_vac", col("k") % 10 === 0)
    lake.compact("main.compact_vac")
    lake.expireSnapshots(lake.currentSnapshot)
    val n = lake.vacuum()
    assert(n >= 3) // 3 original data files + their delete files
    assert(filesOnDisk("compact_vac").count(_.startsWith("ducklake-")) == 1)
    assert(lake.table("main.compact_vac").count() == 54)
    // snapshots list now starts at the retained snapshot
    assert(lake.store.minSnapshot == lake.currentSnapshot)
  }

  test("rollbackTo restores data, MOR deletes and renamed schema; history intact") {
    import spark.implicits._
    lake.createTableAs((1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "s")
      .coalesce(1), "main.rb")
    lake.deleteWhere("main.rb", col("k") % 5 === 0)          // 40 rows
    val target = lake.currentSnapshot
    lake.renameColumn("main.rb", "s", "s2")
    lake.insertInto((51 to 60).map(i => (i.toLong, s"v$i")).toDF("k", "s2")
      .coalesce(1), "main.rb")                               // 50 rows
    lake.deleteWhere("main.rb", col("k") <= 10)              // 42 rows
    assert(lake.table("main.rb").count() == 42)

    val rbSnap = lake.rollbackTo("main.rb", target)
    // state == target: 40 rows, column named s again
    val now = lake.table("main.rb")
    assert(now.columns.toSeq == Seq("k", "s"))
    assert(now.count() == 40)
    assert(now.filter(col("k") % 5 === 0).count() == 0)
    // intermediate history still queryable (nothing erased)
    assert(lake.table("main.rb", Some(target)).count() == 40)
    assert(lake.table("main.rb", Some(rbSnap - 1)).count() == 42)
    assert(lake.table("main.rb", Some(rbSnap - 1)).columns.toSeq == Seq("k", "s2"))
    // writes after rollback work against the restored schema
    lake.insertInto(Seq((100L, "x")).toDF("k", "s"), "main.rb")
    assert(lake.table("main.rb").count() == 41)
  }

  test("zero-copy clone shares files; diverges independently; vacuum keeps shared paths") {
    import spark.implicits._
    lake.createTableAs((1 to 30).map(i => (i.toLong, i * 1.5)).toDF("k", "v")
      .coalesce(1), "main.cl_src")
    lake.deleteWhere("main.cl_src", col("k") > 25)           // MOR state: 25 rows
    val before = filesOnDisk("cl_src")
    lake.cloneTable("main.cl_src", "main.cl_dst")
    // no new physical files — byte-free clone
    assert(filesOnDisk("cl_src") == before)
    assert(filesOnDisk("cl_dst").isEmpty)
    assert(lake.table("main.cl_dst").count() == 25)
    // divergence: writes/deletes on one side don't leak to the other
    lake.insertInto(Seq((100L, 0.0)).toDF("k", "v"), "main.cl_dst")
    lake.deleteWhere("main.cl_src", col("k") === 1)
    assert(lake.table("main.cl_dst").count() == 26)
    assert(lake.table("main.cl_src").count() == 24)
    // drop the source, expire, vacuum: files still referenced by the
    // clone must survive
    lake.dropTable("main.cl_src")
    lake.expireSnapshots(lake.currentSnapshot)
    lake.vacuum()
    assert(lake.table("main.cl_dst").count() == 26)
    assert(lake.table("main.cl_dst").agg(sum(col("k"))).head.getLong(0) ==
      (1 to 25).map(_.toLong).sum + 100L)
  }

  test("rollback of a clone only touches the clone") {
    import spark.implicits._
    lake.createTableAs((1 to 20).map(i => (i.toLong, s"r$i")).toDF("k", "s")
      .coalesce(1), "main.rc_src")
    lake.cloneTable("main.rc_src", "main.rc_dst")
    val cloneSnap = lake.currentSnapshot
    lake.insertInto((21 to 25).map(i => (i.toLong, s"r$i")).toDF("k", "s"),
      "main.rc_dst")
    assert(lake.table("main.rc_dst").count() == 25)
    lake.rollbackTo("main.rc_dst", cloneSnap)
    assert(lake.table("main.rc_dst").count() == 20)
    assert(lake.table("main.rc_src").count() == 20)
  }

  test("rewriteFiles: targets only delete-heavy and small files; content intact") {
    import spark.implicits._
    // file A: 100 rows, will carry 30% deletes; file B: 100 rows, clean;
    // files C,D: tiny (merge candidates)
    lake.createTableAs((1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "s")
      .coalesce(1), "main.rw")
    lake.insertInto((1001 to 2000).map(i => (i.toLong, s"b$i")).toDF("k", "s")
      .coalesce(1), "main.rw")
    lake.insertInto((2001 to 2003).map(i => (i.toLong, s"c$i")).toDF("k", "s")
      .coalesce(1), "main.rw")
    lake.insertInto((2004 to 2006).map(i => (i.toLong, s"d$i")).toDF("k", "s")
      .coalesce(1), "main.rw")
    lake.deleteWhere("main.rw", col("k") <= 300)
    val pre = lake.currentSnapshot
    def fileRecs(snap: Long) = lake.store.getDataFiles(
      lake.store.getTableByName(
        lake.store.getSchemaByName("main", snap).get.schemaId, "rw", snap).get.tableId,
      snap)
    val preFiles = fileRecs(pre)
    assert(preFiles.size == 4 && preFiles.count(_.deleteFile.isDefined) == 1)
    val cleanBig = preFiles.find(f => f.recordCount == 1000 && f.deleteFile.isEmpty).get
    // threshold 0.2 catches file A (30% deleted); 4KB catches C and D
    lake.rewriteFiles("main.rw", minDeleteRatio = 0.2, smallFileBytes = 4096)
    val post = lake.currentSnapshot
    val postFiles = fileRecs(post)
    // clean big file untouched; A (deletes absorbed) + C + D bin-packed
    // into one fresh file in their shared (empty) partition group
    assert(postFiles.exists(_.path == cleanBig.path), "clean file must not be rewritten")
    assert(postFiles.forall(_.deleteFile.isEmpty), "rewrites absorb MOR deletes")
    assert(postFiles.size == 2, s"merged(A,C,D) + B expected: ${postFiles.map(_.recordCount)}")
    assert(postFiles.map(_.recordCount).sorted == Seq(706L, 1000L))
    assert(lake.table("main.rw").count() == 1706)
    assert(lake.table("main.rw").agg(sum("k")).head.getLong(0) ==
      (301 to 2006).map(_.toLong).sum)
    // time travel across the rewrite still sees the pre-rewrite state
    assert(lake.table("main.rw", Some(pre)).count() == 1706)
    // nothing qualifies -> no new snapshot
    assert(lake.rewriteFiles("main.rw", minDeleteRatio = 0.2, smallFileBytes = 0) == post)
  }

  test("snapshot tags: create, resolve in SQL time travel, retag, drop") {
    import spark.implicits._
    lake.createTableAs((1 to 10).map(i => (i.toLong, s"t$i")).toDF("k", "s")
      .coalesce(1), "main.tagged")
    val v1 = lake.currentSnapshot
    lake.insertInto((11 to 15).map(i => (i.toLong, s"t$i")).toDF("k", "s"),
      "main.tagged")
    lake.tagSnapshot("release-1", v1)
    assert(lake.snapshotForTag("release-1").contains(v1))
    // SQL resolution through the catalog plugin
    spark.conf.set("spark.sql.catalog.dlmnt",
      classOf[graft.lake.connector.DuckLakeSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.dlmnt.metaDb", lake.metaDbPath)
    spark.conf.set("spark.sql.catalog.dlmnt.dataPath", lake.dataPath)
    assert(spark.sql(
      "SELECT count(*) FROM dlmnt.main.tagged VERSION AS OF 'release-1'")
      .head().getLong(0) == 10)
    assert(spark.sql("SELECT count(*) FROM dlmnt.main.tagged")
      .head().getLong(0) == 15)
    // CDC between tagged refs: the rows appended after release-1
    lake.tagSnapshot("release-2", lake.currentSnapshot)
    val cdc = lake.tableChanges("main.tagged", "release-1", "release-2")
    assert(cdc.filter(col("change_type") === "insert").count() == 5)
    // retag moves the ref
    lake.tagSnapshot("release-1", lake.currentSnapshot)
    assert(spark.sql(
      "SELECT count(*) FROM dlmnt.main.tagged VERSION AS OF 'release-1'")
      .head().getLong(0) == 15)
    // guards: numeric names shadow snapshot ids; missing snapshots refuse
    intercept[InvalidConfigException](lake.tagSnapshot("123", v1))
    intercept[InvalidSnapshotException](lake.tagSnapshot("ghost", 999999L))
    // unknown tag in SQL is a clear error
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM dlmnt.main.tagged VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("nope"))
    // drop removes resolution, data untouched
    assert(lake.dropTag("release-1"))
    assert(!lake.dropTag("release-1"))
    assert(lake.table("main.tagged").count() == 15)
  }
}
