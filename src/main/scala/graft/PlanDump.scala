package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print the formatted physical plan of a query for scale review
  * (pushed filters, broadcasts, shuffle count — the 100 TB checklist).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the bounded month-grain analytics windows intentionally run on one
    // partition (their input is a post-aggregate of O(months) rows) —
    // WindowExec's blanket no-partition warning for them is noise that
    // drowns the artifact tail, so that one logger rides at ERROR
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
