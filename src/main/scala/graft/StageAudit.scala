package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage decomposition of a named query — wall, tasks,
  * shuffle read/write volume, memory/disk SPILL, aggregate task CPU —
  * under the exact Bench session confs. This is the evidence step the
  * scale audits need when a wall-clock number alone can't say WHERE a
  * 100× query spends (r15 verdict task 1: q18's suspected agg spill).
  *
  * Usage: SPARK_GRAFT_DIR=<corpus> sbt "runMain graft.StageAudit <query> [more...]"
  */
object StageAudit {

  private final case class Row(id: Int, name: String, wallMs: Long,
      tasks: Int, shufReadMb: Double, shufWriteMb: Double,
      memSpillMb: Double, diskSpillMb: Double, cpuMs: Long, runMs: Long)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageAudit <queryName> [more...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shmDir = new java.io.File("/dev/shm")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.parquet.columnarReaderBatchSize", "16384")
      .config("spark.sql.autoBroadcastJoinThreshold", "4m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "4m")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      // runtime bloom-filter join pruning, thresholds corpus-scaled —
      // adopted r16, rationale + A/B evidence in Bench.scala
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "256m")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64m")
      .config("spark.ui.enabled", "false")
    if (shmDir.isDirectory && shmDir.canWrite)
      builder.config("spark.local.dir", "/dev/shm/graft_bench_local")
    sys.env.get("SPARK_GRAFT_CONFS").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = sys.env.getOrElse("SPARK_GRAFT_DIR",
      ScaleBench.buildCorpus(spark, "/root/testdata/sf0.1"))

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.submissionTime; b <- si.completionTime)
          yield b - a).getOrElse(-1L)
        rows.add(Row(si.stageId, si.name.takeWhile(_ != '\n'), wall,
          si.numTasks,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.memoryBytesSpilled / 1e6, m.diskBytesSpilled / 1e6,
          m.executorCpuTime / 1000000, m.executorRunTime))
        ()
      }
    }

    def run(name: String): Unit =
      SparkEntry.queries.get(name).orElse(AbBench.variants.get(name))
        .getOrElse(sys.error(s"unknown query/variant '$name'"))(spark, dir)
        .write.mode("overwrite").format("noop").save()

    args.foreach { name =>
      (1 to 2).foreach(_ => run(name)) // warm: JIT/codegen outside the audit
      spark.sparkContext.addSparkListener(listener)
      rows.clear()
      val t0 = System.nanoTime()
      run(name)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val rs = rows.asScala.toSeq.sortBy(_.id)
      println(f"===== $name: wall $wall%.2f s, ${rs.size} stages =====")
      println(f"${"stage"}%6s ${"wall_ms"}%8s ${"tasks"}%5s ${"shRd_MB"}%8s " +
        f"${"shWr_MB"}%8s ${"memSp_MB"}%9s ${"dskSp_MB"}%9s ${"cpu_ms"}%8s ${"run_ms"}%8s  name")
      rs.foreach { r =>
        println(f"${r.id}%6d ${r.wallMs}%8d ${r.tasks}%5d ${r.shufReadMb}%8.1f " +
          f"${r.shufWriteMb}%8.1f ${r.memSpillMb}%9.1f ${r.diskSpillMb}%9.1f " +
          f"${r.cpuMs}%8d ${r.runMs}%8d  ${r.name}")
      }
      val totSpill = rs.map(r => r.memSpillMb + r.diskSpillMb).sum
      val totShuf = rs.map(_.shufWriteMb).sum
      println(f"TOTAL shuffle-write ${totShuf}%.1f MB, spill ${totSpill}%.1f MB, " +
        f"cpu ${rs.map(_.cpuMs).sum / 1000.0}%.1f s over ${rs.map(_.tasks).sum} tasks")
    }
    spark.stop()
  }
}
