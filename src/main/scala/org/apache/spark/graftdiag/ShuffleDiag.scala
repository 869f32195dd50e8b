package org.apache.spark.graftdiag

import org.apache.spark.{MapOutputTrackerMaster, SparkEnv}

/** Diagnostic-only bridge: raw per-map output sizes for one reduce
  * partition, exactly what AQE's skew splitter sees
  * (ShufflePartitionsUtil.getMapSizesForReduceId).
  */
object ShuffleDiag {
  def mapSizesFor(shuffleId: Int, reduceId: Int): Array[Long] = {
    val t = SparkEnv.get.mapOutputTracker.asInstanceOf[MapOutputTrackerMaster]
    t.shuffleStatuses(shuffleId).withMapStatuses(_.map(s =>
      if (s == null) -1L else s.getSizeForBlock(reduceId)))
  }
}
