package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print the formatted physical plan of a query for scale review
  * (pushed filters, broadcasts, shuffle count — the 100 TB checklist).
  *
  * Usage: PlanDump [--bench] [--conf k=v ...] [--dir <dataDir>] <name...>
  *  - names resolve from [[SparkEntry.queries]] then [[AbBench.variants]]
  *    (so rejected rewrite shapes can be dumped as the "before" plan);
  *  - `--bench` plans under the SAME session config the bench sessions
  *    run (4 MB broadcast threshold, AQE SHJ conversion, runtime bloom
  *    pruning) so a dumped plan matches the timed plan shape;
  *  - `--conf` overrides individual settings on top (e.g.
  *    `--conf spark.sql.optimizer.runtime.bloomFilter.enabled=false`
  *    dumps the bloom-off "before" plan).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    var rest = args.toList
    var bench = false
    var dir = "/root/testdata/sf0.01"
    val confs = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var names = List.empty[String]
    while (rest.nonEmpty) rest match {
      case "--bench" :: tl => bench = true; rest = tl
      case "--dir" :: d :: tl => dir = d; rest = tl
      case "--conf" :: kv :: tl if kv.contains("=") =>
        val Array(k, v) = kv.split("=", 2); confs += (k -> v); rest = tl
      case n :: tl => names :+= n; rest = tl
    }
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", if (bench) "32" else "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (bench) { // mirror the Bench/AbBench session plan-relevant confs
      builder
        .config("spark.sql.autoBroadcastJoinThreshold", "4m")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "4m")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "256m")
        .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64m")
    }
    confs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the bounded month-grain analytics windows intentionally run on one
    // partition (their input is a post-aggregate of O(months) rows) —
    // WindowExec's blanket no-partition warning for them is noise that
    // drowns the artifact tail, so that one logger rides at ERROR
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    names.foreach { name =>
      val f = SparkEntry.queries.get(name).orElse(AbBench.variants.get(name))
        .getOrElse(sys.error(s"unknown query/variant '$name'"))
      println(s"===== $name =====")
      println(f(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
