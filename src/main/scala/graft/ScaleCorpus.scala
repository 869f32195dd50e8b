package graft

import org.apache.spark.sql.SparkSession

/** Builds (or reuses) the ScaleBench 10× replica corpus and the staged
  * sf0.1 bench layout, then prints both paths — the prerequisite for
  * per-query tuning runs (BenchOne with SPARK_GRAFT_DIR) and for
  * re-recording the scale10 DuckDB timings (scripts/time_oracle.py)
  * without paying a full Bench pass.
  */
object ScaleCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (staged, sec) = BenchLayout.prepare(spark, sfDir)
    println(s"staged: $staged (${sec}s)")
    val dir = ScaleBench.buildCorpus(spark, sfDir)
    println(s"scale10: $dir")
    spark.stop()
  }
}
