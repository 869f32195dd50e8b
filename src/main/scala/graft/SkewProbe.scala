package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone diagnostic for the scale10 AQE skew-split gate: replays
  * ScaleBench's planted-skew join with the SAME scoped confs, then dumps
  * exactly what AQE's skew splitter sees — per-shuffle-stage partition
  * byte histograms and the per-MAP sizes of the hottest reduce partition
  * (via [[org.apache.spark.graftdiag.ShuffleDiag]]). A SKEWFIRED=true
  * here predicts `aqe_skew_split_fired:true` in the bench artifact.
  *
  * Lessons this probe encodes (found round 9):
  *  - the skew verdict must be read from the probe Dataset's OWN
  *    QueryExecution after an action on it — a noop write plans a fresh
  *    QueryExecution and leaves this one un-finalized;
  *  - OptimizeSkewedJoin can only cut a skewed reduce partition at MAP
  *    boundaries (ShufflePartitionsUtil.createSkewPartitionSpecs returns
  *    None for a single-mapper shuffle), so the corpus layout must give
  *    the scan a cluster-like mapper count;
  *  - a constant-key hot partition of low-entropy rows LZ4-compresses to
  *    near the median partition size, hiding row skew from the
  *    byte-based detector — the planted rows need incompressible payload.
  */
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
    // the gate's own conf map (shared val — the probe can't drift)
    ScaleBench.skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }

    val dir = ScaleBench.buildCorpus(spark, "/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(when(pmod(xxhash64(col("l_orderkey")), lit(10)) === 0, lit(1L))
        .otherwise(col("l_orderkey")).as("k"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val j = li.join(o, "k").groupBy(col("k") % 97)
      .agg(sum(col("l_quantity") * col("o_totalprice")).as("v"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("rev"))

    println("LI_SCAN_PARTS=" + li.rdd.getNumPartitions)
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    println("SKEWFIRED=" + p.contains("skew=true"))
    println(p.split("\n").filter(l => l.contains("Join") || l.contains("skew")
      || l.contains("AQEShuffleRead")).mkString("\n"))

    // descend through query stages (ResultQueryStageExec wraps the final
    // plan; earlier stages nest under later stages' plans) and dump what
    // the skew splitter saw per shuffle
    def stages(pl: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec] = {
      val here = pl match {
        case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
          s +: stages(s.plan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => stages(q.plan)
        case _ => Seq.empty
      }
      here ++ pl.children.flatMap(stages)
    }
    val fin = j.queryExecution.executedPlan
      .asInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]
      .executedPlan
    stages(fin).foreach { st =>
      val sizes = st.mapStats.map(_.bytesByPartitionId).getOrElse(Array.empty[Long])
      if (sizes.nonEmpty) {
        val hot = sizes.indexOf(sizes.max)
        val sorted = sizes.sorted
        println(s"STAGE ${st.id} mappers=${st.shuffle.numMappers} " +
          s"max=${sizes.max} median=${sorted(sizes.length / 2)} hotIdx=$hot")
        val sid = st.mapStats.get.shuffleId
        val ms = org.apache.spark.graftdiag.ShuffleDiag.mapSizesFor(sid, hot)
        println(s"MAPSIZES stage=${st.id} nonzeroMaps=${ms.count(_ > 0)} " +
          s"neg=${ms.count(_ < 0)} sum=${ms.sum}")
        val spec = org.apache.spark.sql.execution.adaptive.ShufflePartitionsUtil
          .createSkewPartitionSpecs(sid, hot, 2 * 1024 * 1024, 0.2)
        println(s"SPLITSPEC stage=${st.id} -> " + spec.map(_.length))
      }
    }
    spark.stop()
  }
}
