package graft.lake

import java.nio.file.Files

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Concurrency behavior, mirroring the reference's concurrent test suites
  * (tests/concurrent_tests.rs, tests/concurrent_write_tests.rs): parallel
  * writers serialize into distinct snapshots with no lost updates, and
  * snapshot-pinned readers stay consistent while writes land. The embedded
  * metadata backend serializes commits (single-process, like the
  * reference's SQLite backend — SURVEY.md §7.4); Spark job execution
  * itself is fully parallel.
  */
class ConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val root = Files.createTempDirectory("ducklake-conc").toString
  private lazy val lake = new DuckLake(spark, s"$root/meta", s"$root/data")

  override def afterAll(): Unit = { lake.close(); spark.stop() }

  private implicit val ec: ExecutionContext = ExecutionContext.global

  test("16 concurrent appenders: distinct snapshots, no lost rows") {
    import spark.implicits._
    lake.createTableAs(Seq((0L, "seed")).toDF("id", "tag").coalesce(1), "main.conc")
    // optimistic-CAS contract: N simultaneous single-table appenders can
    // each lose up to N-1 publish races, so no-loss needs a retry budget
    // ≥ N-1 (the default 10 covers realistic contention, not a 16-way
    // synchronized barrage; corpus settings/max_retry_count asserts the
    // EXHAUSTION side of the same contract)
    lake.maxRetryCount = 32
    val base = lake.currentSnapshot
    val snaps = Await.result(Future.sequence((1 to 16).map { w =>
      Future {
        lake.insertInto(Seq((w.toLong, s"writer$w")).toDF("id", "tag")
          .coalesce(1), "main.conc")
      }
    }), 180.seconds)
    assert(snaps.distinct.size == 16, "every commit must get its own snapshot")
    assert(lake.currentSnapshot == base + 16)
    assert(lake.table("main.conc").count() == 17)
    assert(lake.table("main.conc").agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0) == (1 to 16).sum.toLong)
    // pinned read at base is untouched by the 16 later commits
    assert(lake.table("main.conc", Some(base)).count() == 1)
    lake.maxRetryCount = 10
  }

  test("concurrent writers to DIFFERENT tables don't interleave state") {
    import spark.implicits._
    val snapsBefore = lake.currentSnapshot
    Await.result(Future.sequence((1 to 6).map { w =>
      Future {
        lake.createTableAs((1 to 10).map(i => (i.toLong, w)).toDF("v", "w")
          .coalesce(1), s"main.conc_t$w")
      }
    }), 180.seconds)
    (1 to 6).foreach { w =>
      val t = lake.table(s"main.conc_t$w")
      assert(t.count() == 10)
      assert(t.select("w").distinct().head().getInt(0) == w)
    }
    assert(lake.currentSnapshot == snapsBefore + 6)
  }

  test("concurrent multi-table transactions stay atomic (no interleaved snapshots)") {
    import spark.implicits._
    lake.createTableAs(Seq((0L, 0L)).toDF("a", "b").coalesce(1), "main.txn_a")
    lake.createTableAs(Seq((0L, 0L)).toDF("a", "b").coalesce(1), "main.txn_b")
    val snaps = Await.result(Future.sequence((1 to 8).map { w =>
      Future {
        lake.transaction { tx =>
          tx.write(Seq((w.toLong, 1L)).toDF("a", "b").coalesce(1), "main.txn_a")
          tx.write(Seq((w.toLong, 2L)).toDF("a", "b").coalesce(1), "main.txn_b")
        }
      }
    }), 180.seconds)
    assert(snaps.distinct.size == 8)
    // at EVERY transaction snapshot both tables moved together
    snaps.foreach { s =>
      val na = lake.table("main.txn_a", Some(s)).count()
      val nb = lake.table("main.txn_b", Some(s)).count()
      assert(na == nb, s"snapshot $s: txn_a=$na txn_b=$nb must be equal")
    }
    assert(lake.table("main.txn_a").count() == 9)
    assert(lake.table("main.txn_b").count() == 9)
  }

  test("concurrent inlined appends serialize with no lost rows") {
    import spark.implicits._
    val iroot = Files.createTempDirectory("ducklake-conc-inl").toString
    val inl = new DuckLake(spark, s"$iroot/meta", s"$iroot/data", inlineRowLimit = 8)
    // 12 simultaneous same-table appenders under the optimistic CAS: the
    // budget must cover racers-1 (see the 16-appender test)
    inl.maxRetryCount = 24
    try {
      inl.createTableAs(Seq((0L, "seed")).toDF("id", "tag").coalesce(1), "main.ci")
      Await.result(Future.sequence((1 to 12).map { w =>
        Future {
          inl.insertInto(Seq((w.toLong, s"w$w")).toDF("id", "tag"), "main.ci")
        }
      }), 180.seconds)
      val t = inl.table("main.ci")
      assert(t.count() == 13)
      assert(t.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0) ==
        (1 to 12).sum.toLong)
      // seed CTAS and all 12 appends inlined: no data files at all
      assert(inl.listFilesDF.count() == 0)
    } finally inl.close()
  }

  test("snapshot-pinned reader is stable across a concurrent delete+append") {
    import spark.implicits._
    lake.createTableAs((1 to 100).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .coalesce(1), "main.conc_stable")
    val pinned = lake.currentSnapshot
    val before = lake.table("main.conc_stable", Some(pinned)).count()
    // mutate underneath the pin
    lake.deleteWhere("main.conc_stable", org.apache.spark.sql.functions.col("k") <= 50)
    lake.insertInto(Seq((101L, 202.0)).toDF("k", "v").coalesce(1), "main.conc_stable")
    assert(lake.table("main.conc_stable", Some(pinned)).count() == before)
    assert(lake.table("main.conc_stable").count() == 51)
  }

  test("optimistic commit-conflict rules (reference transaction_conflicts semantics)") {
    import spark.implicits._
    val base = lake.currentSnapshot
    lake.createTableAs(Seq((1L, "a")).toDF("k", "v").coalesce(1), "main.ccr_t")
    val tid = {
      val snap = lake.currentSnapshot
      val sch = lake.store.getSchemaByName("main", snap).get
      lake.store.getTableByName(sch.schemaId, "ccr_t", snap).get.tableId
    }
    val mainId = lake.store.getSchemaByName("main", lake.currentSnapshot).get.schemaId
    // same-name create vs create → conflict; different name → fine
    assert(lake.store.commitConflicts(base,
      Seq(TxnIntent("tables_created", name = Some("main.ccr_t"),
        schemaId = Some(mainId)))).nonEmpty)
    assert(lake.store.commitConflicts(base,
      Seq(TxnIntent("tables_created", name = Some("main.other"),
        schemaId = Some(mainId)))).isEmpty)
    // a VIEW of the same name also conflicts (shared namespace)
    assert(lake.store.commitConflicts(base,
      Seq(TxnIntent("views_created", name = Some("main.ccr_t"),
        schemaId = Some(mainId)))).nonEmpty)
    // insert vs insert → fine; delete vs delete → conflict
    val base2 = lake.currentSnapshot
    lake.insertInto(Seq((2L, "b")).toDF("k", "v").coalesce(1), "main.ccr_t")
    assert(lake.store.commitConflicts(base2,
      Seq(TxnIntent("tables_inserted_into", entityId = Some(tid)))).isEmpty)
    val base3 = lake.currentSnapshot
    lake.deleteWhere("main.ccr_t", org.apache.spark.sql.functions.col("k") === 1L)
    assert(lake.store.commitConflicts(base3,
      Seq(TxnIntent("tables_deleted_from", entityId = Some(tid)))).nonEmpty)
    assert(lake.store.commitConflicts(base3,
      Seq(TxnIntent("tables_inserted_into", entityId = Some(tid)))).isEmpty)
    // compaction vs the committed delete → conflict; vs nothing → fine
    assert(lake.store.commitConflicts(base3,
      Seq(TxnIntent("_files_compacted", entityId = Some(tid)))).nonEmpty)
    assert(lake.store.commitConflicts(lake.currentSnapshot,
      Seq(TxnIntent("_files_compacted", entityId = Some(tid)))).isEmpty)
  }

  test("append CAS: a zero-retry writer that loses the race fails with the budget error") {
    import spark.implicits._
    lake.createTableAs(Seq((0L, "seed")).toDF("id", "tag").coalesce(1), "main.cas0")
    lake.maxRetryCount = 0
    try {
      // two appenders released together: with ZERO retries at most one
      // can survive the publish race; rerun until the race actually
      // happens (same-JVM scheduling can serialize a lucky pair)
      val loser = (1 to 8).iterator.map { round =>
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val ts = (1 to 2).map { w =>
          new Thread(() => {
            barrier.await()
            try lake.insertInto(
              Seq((round * 10L + w, s"w$w")).toDF("id", "tag").coalesce(1),
              "main.cas0")
            catch { case e: Throwable => errs.add(e) }
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join(60000))
        Option(errs.peek())
      }.collectFirst { case Some(e) => e }
      assert(loser.isDefined,
        "two synchronized zero-retry appenders never collided in 8 rounds")
      assert(loser.get.isInstanceOf[TransactionConflictException] &&
        loser.get.getMessage.contains(
          "maximum retry count of 0 set by the ducklake_max_retry_count"),
        s"unexpected loser error: ${loser.get}")
    } finally lake.maxRetryCount = 10
    // and losers never corrupt state: every surviving row is intact
    val rows = lake.table("main.cas0").count()
    assert(rows >= 2) // seed + at least the winners
  }

  test("replace CAS: an append landing during compact raises a conflict, never last-wins") {
    import spark.implicits._
    lake.createTableAs(
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag").coalesce(1), "main.repl")
    // deterministic interleave: inject the racing append between the
    // replace's staging and its publish gate (the hook resets itself so
    // the injected append publishes normally)
    lake.beforePublishHook = () => {
      lake.beforePublishHook = () => ()
      lake.insertInto(Seq((99L, "raced")).toDF("id", "tag").coalesce(1),
        "main.repl")
    }
    try {
      val e = intercept[TransactionConflictException](lake.compact("main.repl"))
      assert(e.getMessage.contains("conflict"))
    } finally lake.beforePublishHook = () => ()
    // the concurrent append's row survived; the stale rewrite published nothing
    assert(lake.table("main.repl")
      .filter(org.apache.spark.sql.functions.col("id") === 99L).count() == 1)
    assert(lake.table("main.repl").count() == 3)
    // a CLEAN compact (no race) still succeeds afterwards
    lake.compact("main.repl")
    assert(lake.table("main.repl").count() == 3)
  }

  test("replace CAS: an append in compact's scan->write gap still conflicts") {
    import spark.implicits._
    lake.createTableAs(
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag").coalesce(1), "main.repl2")
    // the WIDE race window: compact has already pinned and materialized
    // its input, but writeOnce hasn't started — a base captured at
    // writeOnce entry would see the raced append as "no conflict" and
    // silently erase it
    lake.afterRewriteScanHook = () => {
      lake.afterRewriteScanHook = () => ()
      lake.insertInto(Seq((99L, "raced")).toDF("id", "tag").coalesce(1),
        "main.repl2")
    }
    try {
      val e = intercept[TransactionConflictException](lake.compact("main.repl2"))
      assert(e.getMessage.contains("conflict"))
    } finally lake.afterRewriteScanHook = () => ()
    // the raced append's row survived; the stale rewrite published nothing
    assert(lake.table("main.repl2")
      .filter(org.apache.spark.sql.functions.col("id") === 99L).count() == 1)
    assert(lake.table("main.repl2").count() == 3)
    // a clean compact afterwards still succeeds
    lake.compact("main.repl2")
    assert(lake.table("main.repl2").count() == 3)
  }
}
