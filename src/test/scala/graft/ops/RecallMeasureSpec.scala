package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.OpsQueries

/** Calibrates (and then guards) the planted-twin recall bounds the
  * `dedup_minhash` / `dedup_simhash` CORRECTNESS gates assert: the
  * xxhash64 sketches are not expressible in the DuckDB oracle, so those
  * gates emit deterministic recall summaries (sim_lsh_topk pattern) whose
  * bounds must hold at every test scale. This spec prints the measured
  * ratios per SF and asserts the gate bounds with margin.
  */
class RecallMeasureSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    // the suite shares one JVM-wide session: every builder must carry the
    // lake extensions or a LATER spec inherits a session without them
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("minhash planted-twin recall clears the gate bound at every SF") {
    for (dir <- sfDirs) {
      val corpus = OpsQueries.plantedDocs(spark, dir)
      val cands = Dedup.minhashCandidates(corpus, "text", "doc_id")
      val found = Dedup.verifyJaccard(cands, corpus, "text", "doc_id", threshold = 0.5)
      val planted = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000L).as("id_b"))
      val eligible = Dedup.verifyJaccard(planted, corpus, "text", "doc_id", threshold = 0.5)
      val nEligible = eligible.count()
      val nRecovered = eligible.join(found, Seq("id_a", "id_b"), "left_semi").count()
      info(s"$dir minhash: eligible=$nEligible recovered=$nRecovered " +
        f"ratio=${nRecovered.toDouble / nEligible}%.3f")
      assert(nEligible > 0)
      assert(nRecovered >= math.ceil(0.80 * nEligible).toLong)
    }
  }

  test("simhash planted-twin recall clears the gate bound at every SF") {
    for (dir <- sfDirs) {
      val corpus = OpsQueries.plantedDocs(spark, dir)
      val fps = Dedup.simhash64(corpus, "text", "doc_id")
      val pairs = Dedup.simhashPairs(fps, "doc_id", maxHamming = 8)
      val planted = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 100000L).as("id_b"))
      val nPlanted = planted.count()
      val nRecovered = planted.join(pairs, Seq("id_a", "id_b"), "left_semi").count()
      info(s"$dir simhash: planted=$nPlanted recovered=$nRecovered " +
        f"ratio=${nRecovered.toDouble / nPlanted}%.3f")
      assert(nPlanted > 0)
      assert(nRecovered >= math.ceil(0.60 * nPlanted).toLong)
    }
  }
}
