package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming admission control at catalog scale (r14 verdict task 7): a
  * stream bootstrapping a 100 TB table walks thousands of snapshots
  * through `maxFilesPerTrigger`, and each micro-batch's offset advance
  * must cost ONE catalog listing query — not one query per snapshot —
  * or the backfill pays O(snapshots²) round trips before it reads a
  * byte. This spec synthesizes a 10k-snapshot / 20k-file catalog (the
  * MetaScaleSpec bulk-load pattern) and pins, per batch: the query
  * tally, the calibrated wall-clock, monotonic offset progress, and the
  * exact file budget.
  */
class StreamBackfillScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val root = Files.createTempDirectory("dl-streamscale").toString
  private lazy val lake = new DuckLake(spark, s"$root/meta", s"$root/data")

  private val NumSnapshots = 10000
  private val FilesPerSnapshot = 2

  override def afterAll(): Unit = { lake.close(); spark.stop() }

  private lazy val slowdown =
    math.max(1.0, graft.Calibration.stQuick() / graft.Calibration.NominalStSec)

  test(s"offset advance over a $NumSnapshots-snapshot backfill costs one listing per batch") {
    import spark.implicits._
    info(f"host slowdown factor: $slowdown%.2fx (budgets scale with it)")
    lake.createTableAs(
      Seq((1L, "seed")).toDF("id", "tag").coalesce(1), "main.bf")
    val snapBase = lake.currentSnapshot
    // schema capture BEFORE the synthetic bulk-load: the synthetic file
    // rows have no parquet behind them, and this test exercises offset
    // planning (pure catalog), never the data read
    val schema = lake.table("main.bf").schema
    val tr = lake.store.getSchemaByName("main", snapBase)
      .flatMap(s => lake.store.getTableByName(s.schemaId, "bf", snapBase)).get

    // bulk-load 10k synthetic snapshots, each appending FilesPerSnapshot
    // files — the shape of a long-running ingestion the stream backfills
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$root/meta")
    try {
      conn.setAutoCommit(false)
      val sn = conn.prepareStatement(
        "INSERT INTO ducklake_snapshot(snapshot_id, snapshot_time) VALUES (?, CURRENT_TIMESTAMP)")
      val pf = conn.prepareStatement(
        """INSERT INTO ducklake_data_file(data_file_id, table_id, path,
          |  path_is_relative, record_count, file_size_bytes, footer_size,
          |  begin_snapshot, end_snapshot, encryption_key, write_epoch,
          |  mapping_id, row_id_start, partition_id)
          |VALUES (?, ?, ?, true, 1000, 1048576, 1024, ?, NULL, NULL, 0, NULL, ?, NULL)"""
          .stripMargin)
      var i = 0
      while (i < NumSnapshots) {
        val snap = snapBase + 1 + i
        sn.setLong(1, snap); sn.addBatch()
        var f = 0
        while (f < FilesPerSnapshot) {
          val fid = 2000000L + i.toLong * FilesPerSnapshot + f
          pf.setLong(1, fid); pf.setLong(2, tr.tableId)
          pf.setString(3, s"bf_${i}_$f.parquet")
          pf.setLong(4, snap); pf.setLong(5, fid * 1000L)
          pf.addBatch()
          f += 1
        }
        i += 1
        if (i % 2000 == 0) { sn.executeBatch(); pf.executeBatch() }
      }
      sn.executeBatch(); pf.executeBatch()
      conn.commit()
      sn.close(); pf.close()
    } finally conn.close()

    val stream = new graft.lake.connector.DuckLakeMicroBatchStream(
      lake, "main.bf", schema,
      maxFilesPerTrigger = Some(512))
    val head = lake.store.currentSnapshot
    assert(head == snapBase + NumSnapshots)

    // drive the admission-control walk batch by batch to the head; tally
    // catalog queries and wall-clock per advance
    var offset: Long = snapBase
    var batches = 0
    var worstQueries = 0L
    var worstMs = 0.0
    while (offset < head && batches < 200) {
      val q0 = lake.store.queryTally.get()
      val t0 = System.nanoTime()
      val next = stream.latestOffset(
        graft.lake.connector.SnapshotOffset(offset),
        ReadLimit.maxFiles(512))
        .asInstanceOf[graft.lake.connector.SnapshotOffset].snapshot
      val ms = (System.nanoTime() - t0) / 1e6
      val dq = lake.store.queryTally.get() - q0
      assert(next > offset, s"offset must advance (batch $batches stuck at $offset)")
      // one file listing + the snapshot/schema/table resolution quartet —
      // a CONSTANT 5 per batch; snapshot count must not appear in the
      // query cost (the r14 concern: a 10k-snapshot walk issuing one
      // query per snapshot would read ~256 here)
      assert(dq <= 5, s"batch $batches cost $dq catalog queries (budget 5)")
      // budget: 512 files / 2-per-snapshot = 256 snapshots per batch,
      // except the final partial batch
      if (next < head)
        assert(next - offset == 256L, s"batch $batches advanced ${next - offset} snapshots")
      worstQueries = math.max(worstQueries, dq)
      worstMs = math.max(worstMs, ms)
      offset = next
      batches += 1
    }
    assert(offset == head, s"backfill must reach the head (stopped at $offset of $head)")
    assert(batches == math.ceil(NumSnapshots / 256.0).toInt)
    info(f"$batches batches; worst advance: $worstQueries queries, $worstMs%.0f ms")
    // calibrated wall budget per advance: the listing scans ~20k rows of
    // one indexed table — quiet-host measurements sit well under 150 ms
    assert(worstMs < 500 * slowdown,
      f"worst offset advance $worstMs%.0f ms (budget ${500 * slowdown}%.0f ms)")
  }
}
