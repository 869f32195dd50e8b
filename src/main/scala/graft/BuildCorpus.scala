package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: materialize (or reuse) the replicated bench corpora without
  * running a probe — prints the corpus dir for use as SPARK_GRAFT_DIR in
  * AbBench/PlanDump sessions. `runMain graft.BuildCorpus [reps] [nFiles]`
  * (defaults 100/128, the Probe100x corpus; 10/32 gives ScaleBench's).
  */
object BuildCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(100)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(128)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the 100-replica lineitem crossJoin runs its sort-before-
      // repartition as ONE task over 60M rows (the source is a single
      // parquet file); under GC pressure that task exceeded the default
      // 120 s heartbeat timeout and the local executor was declared
      // dead mid-build (observed r16). Content-preserving fix: raise
      // the timeout — local mode has no real liveness to protect.
      .config("spark.network.timeout", "600s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir =
      if (reps == ScaleBench.replicas) ScaleBench.buildCorpus(spark, sfDir)
      else ScaleBench.buildCorpusN(spark, sfDir, reps, nFiles)
    spark.stop()
    println(s"CORPUS=$dir")
  }
}
