package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val builder = SparkSession.builder().master(s"local[$cpus]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments, applied at BUILDER time so core confs
    // (shuffle compression, local dirs) take effect, not just SQL ones:
    // SPARK_GRAFT_CONFS="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONFS").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the bounded month-grain analytics windows intentionally run on one
    // partition (their input is a post-aggregate of O(months) rows) —
    // WindowExec's blanket no-partition warning for them is noise that
    // drowns the artifact tail, so that one logger rides at ERROR
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    // SPARK_GRAFT_RAW=1 times against the raw single-row-group fixtures
    // instead of the staged scan-parallel layout (see BenchLayout);
    // SPARK_GRAFT_DIR=<path> points at any corpus (e.g. the scale10
    // replica under /tmp) and wins over both
    val dir = sys.env.get("SPARK_GRAFT_DIR").getOrElse {
      if (sys.env.get("SPARK_GRAFT_RAW").contains("1")) "/root/testdata/sf0.1"
      else BenchLayout.prepare(spark, "/root/testdata/sf0.1")._1
    }
    args.foreach { name =>
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        println(f"$name iter$i: ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
