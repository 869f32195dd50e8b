package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone timing harness for connectedComponents on the scale10
  * stress shape (ScaleBench's `cc_path_1m`): a scrambled n-vertex PATH —
  * diameter n, the adversarial input for any propagation algorithm and
  * the shape that drove the Shiloach–Vishkin hook+shortcut design.
  * Usage: runMain graft.CCBench [nVertices] [iters]
  */
object CCBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val iters = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = spark.range(n - 1).select(
      (col("id") * 2654435761L % 1000000007L).as("src"),
      ((col("id") + 1) * 2654435761L % 1000000007L).as("dst"))
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.connectedComponents(edges, "src", "dst")
      require(out.select(count_distinct(col("component"))).head.getLong(0) == 1L)
      println(f"cc_path_$n iter$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
