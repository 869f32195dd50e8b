package graft

import org.apache.spark.sql.SparkSession

/** Bench ingest: stage the driver testdata into a scan-parallel layout.
  *
  * The driver-generated parquet fixtures are written as ONE file with
  * ONE row group per table (600k lineitem rows in a single row group at
  * sf0.1). Parquet row groups are the unit of split for every
  * row-group-granular engine, so against the raw fixtures EVERY scan
  * stage — and with it the whole map phase of the compute-heavy text /
  * dedup operators — runs as a single task on a 32-core machine. No
  * real corpus looks like this: a 100 TB table is thousands of files /
  * row groups and scans are embarrassingly parallel.
  *
  * The reference's benchmark protocol ingests the source data into the
  * engine's preferred layout before timing (benchmark/src/main.rs —
  * load phase precedes the timed runs); this is the Spark analog: a
  * one-time, fingerprinted, declared re-write of each table into
  * size-proportional multi-file parquet under /tmp. Verify (the
  * correctness gate) keeps reading the raw fixtures — only Bench and
  * BenchOne stage data (Bench since round 10; SPARK_GRAFT_RAW=1 opts
  * back into the raw fixtures), and the staging time is reported in
  * the bench artifact (`relayout_sec`), never folded into query
  * timings. The DuckDB cross-engine recording must be taken on the
  * SAME staged layout (scripts/time_oracle.py handles directory
  * tables); [[fingerprint]] is embedded in the recording so Bench can
  * detect a stale one.
  */
object BenchLayout {

  /** 32 output files (the bench core count) for every non-trivial
    * table; only the tiny dimensions (region/nation, < 64 KB) stay
    * single-file. Sizing by bytes would under-parallelize exactly the
    * tables where parallelism matters most: documents/embeddings are
    * small on disk but carry the heaviest per-row compute (tokenization,
    * sketching, vector math), so the map phase — not the scan — is what
    * the file count must spread across cores.
    */
  private def fileCount(bytes: Long): Int =
    if (bytes < 64 * 1024) 1 else 32

  def stagedDir(srcDir: String): String =
    s"/tmp/graft_bench_${srcDir.replaceAll("[^a-zA-Z0-9.]", "_")}"

  /** Source-content fingerprint (sizes + mtimes + layout version): keys
    * the staging marker AND rides the DuckDB timing recording, so a
    * recording taken on an older fixture generation is detectably stale.
    */
  def fingerprint(srcDir: String): String = {
    val srcFiles = Option(new java.io.File(srcDir).listFiles())
      .getOrElse(sys.error(s"BenchLayout: source dir $srcDir missing or unreadable"))
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    srcFiles.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|") + "|relayout-v2"
  }

  /** Returns (stagedDir, stagingSeconds); stagingSeconds is 0.0 when a
    * fingerprint-matched staging already exists from a previous run.
    * Single-process use assumed: two JVMs staging the same srcDir
    * concurrently would race on the overwrite+marker sequence (the
    * bench protocol never does this).
    */
  def prepare(spark: SparkSession, srcDir: String): (String, Double) = {
    val outDir = stagedDir(srcDir)
    val marker = new java.io.File(s"$outDir/_GRAFT_BENCH_LAYOUT_DONE")
    val fp = fingerprint(srcDir)
    if (marker.exists() &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == fp)
      return (outDir, 0.0)

    val t0 = System.nanoTime()
    graft.queries.Tables.names.foreach { name =>
      val src = new java.io.File(srcDir, s"$name.parquet")
      if (src.exists()) {
        val n = fileCount(src.length)
        // events flows through Tables.t's nanos→µs NTZ normalization and
        // is re-read the same way (t() no-ops on native timestamps)
        graft.queries.Tables.t(spark, srcDir, name)
          .repartition(n)
          .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      }
    }
    marker.getParentFile.mkdirs()
    java.nio.file.Files.write(marker.toPath, fp.getBytes("UTF-8"))
    (outDir, (System.nanoTime() - t0) / 1e9)
  }
}
