package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.adaptive", org.apache.logging.log4j.Level.DEBUG)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    val dir = "/tmp/graft_scale10__root_testdata_sf0.1"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(when(col("l_orderkey") % 3 === 0, lit(1L))
        .otherwise(col("l_orderkey")).as("k"), col("l_quantity"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val j = li.join(o, "k").groupBy(col("k") % 97)
      .agg(sum(col("l_quantity") * col("o_totalprice")).as("v"))
    li.repartition(32, col("k")).groupBy(spark_partition_id().as("pid"))
      .count().orderBy(desc("count")).show(5)
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    println("SKEWFIRED=" + p.contains("skew=true"))
    val fin = j.queryExecution.executedPlan
      .asInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]
      .executedPlan
    println("FINPLAN:\n" + fin.toString.split("\n").take(25).mkString("\n"))
    fin.collect { case st: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
      val sizes = st.mapStats.map(_.bytesByPartitionId).getOrElse(Array.empty[Long])
      val sorted = sizes.sorted
      println(s"stage ${st.id} origin=${st.shuffle.shuffleOrigin} n=${sizes.length} " +
        s"max=${if (sizes.nonEmpty) sizes.max else -1} " +
        s"median=${if (sizes.nonEmpty) sorted(sizes.length / 2) else -1}")
    }
    println(p.split("\n").filter(l => l.contains("Join") || l.contains("skew") || l.contains("AQEShuffleRead")).mkString("\n"))
    spark.stop()
  }
}
