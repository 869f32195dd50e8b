package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Plan-shape regression guard for the hottest bench queries: pins the
  * physical-plan properties the 100 TB story depends on — dimension
  * joins broadcast, no cartesian products, parquet filter pushdown
  * reaching the scan, delete-free lake scans staying a single relation
  * (no per-file union) — so a future Catalyst/conf drift fails THIS
  * suite instead of silently regressing a bench round. The
  * deliberately-broken-conf test proves the guard actually flips.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.lake.connector.GraftSparkExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Static physical plan (AQE initial plan — what the cost-based
    * planner decided before runtime stats, i.e. what a fresh cluster
    * run starts from).
    */
  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private val hot = Seq("q08_market_share", "dedup_minhash", "txt_lm_score",
    "pipe_curation", "ds_multisupp_returns")

  test("hot bench queries plan no cartesian product") {
    hot.foreach { n =>
      val p = planOf(n)
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian:\n$p")
    }
  }

  test("dimension joins broadcast in the hot queries") {
    Seq("q08_market_share", "txt_lm_score", "pipe_curation").foreach { n =>
      val p = planOf(n)
      assert(p.contains("BroadcastHashJoin"),
        s"$n lost its broadcast dimension join:\n$p")
    }
  }

  test("filter pushdown reaches the parquet scan (q06)") {
    val p = planOf("q06_forecast_revenue")
    assert(raw"PushedFilters: \[[^\]]".r.findFirstIn(p).isDefined,
      s"q06 scan has no pushed filters:\n$p")
  }

  test("new r13 ops plan no cartesian; span coverage joins hash-keyed") {
    Seq("dedup_span_coverage", "dedup_incremental", "pipe_quantile_filter",
        "txt_top_ngrams", "dedup_keep_best").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian:\n$p")
    }
    // the dup-hash join-back must be keyed (hash or sort-merge on the
    // gram hash), never a nested loop over the exploded gram stream
    val span = planOf("dedup_span_coverage")
    assert(!span.contains("BroadcastNestedLoopJoin"),
      s"span coverage degraded to a nested loop:\n$span")
  }

  test("LSH sketch expressions are evaluated once per row (no filter-side copy)") {
    // r16: collapseMarked's null-key filter used to be pushed below the
    // sketch projection, so `isnotnull(minhash_bands(...))` sat in a
    // Filter next to the `minhash_bands(...) AS __bands` Project and the
    // whole sketch (tokenize + gram + N hashes) ran TWICE per row — the
    // dominant map-side CPU of every LSH op at any scale. The filter now
    // tests the materialized key attribute above the collapse window;
    // this pins that no Filter condition re-states the sketch.
    Seq("dedup_minhash" -> "minhash_bands", "dedup_simhash" -> "simhash64")
      .foreach { case (q, expr) =>
        val p = planOf(q)
        val dup = p.linesIterator.filter(_.contains(s"isnotnull($expr("))
        assert(dup.isEmpty,
          s"$q re-evaluates $expr inside a filter condition:\n$p")
      }
    // pipe_curation's quality threshold: the same mechanism via alias
    // substitution — the generator boundary must keep the scoring
    // expression out of every Filter (one text_stats pass per row)
    val cur = planOf("pipe_curation")
    val scoredFilter = cur.linesIterator
      .filter(l => l.contains("Filter") && l.contains("text_stats("))
    assert(scoredFilter.isEmpty,
      s"pipe_curation re-scores text inside a filter condition:\n$cur")
  }

  test("LSH sketch single evaluation: positive count + every collapseMarked consumer") {
    // r16 ADVICE: the negative string pin above could go vacuous on a
    // Spark plan-format change. Positive invariant: the sketch-defining
    // expression occurs an exact small number of times in the whole
    // plan (dedup_minhash after the r16 fix: 2 — one per union branch,
    // projection only; the broken shape carried 4). Plus the consumers
    // the negative pin didn't cover: the md5 twins and the cosine
    // near-dup path.
    def occ(p: String, needle: String): Int =
      p.sliding(needle.length).count(_ == needle)
    assert(occ(planOf("dedup_minhash"), "minhash_bands(") == 2,
      "dedup_minhash must evaluate minhash_bands exactly twice " +
        "(found+eligible branches), once per row each")
    assert(occ(planOf("dedup_simhash"), "simhash64(") == 2,
      "dedup_simhash must evaluate simhash64 exactly twice " +
        "(found+eligible branches), once per row each")
    // md5 twins: the band array is a post-aggregate attribute, so the
    // duplication mechanism would surface as a Filter re-stating the
    // md5 banding expression next to its defining aggregate
    Seq("dedup_minhash_md5", "dedup_simhash_md5").foreach { q =>
      val p = planOf(q)
      val bad = p.linesIterator
        .filter(l => l.contains("Filter") && l.contains("md5("))
      assert(bad.isEmpty,
        s"$q re-evaluates the md5 sketch inside a filter:\n${bad.mkString("\n")}")
    }
    // cosine near-dup: the dedup_embedding GATE is a deliberate exact
    // cross-join fixture, so pin the operator itself — the hyperplane
    // signature (vec_dot against literal planes) must stay out of every
    // Filter, and exist somewhere (non-vacuous)
    val embDf = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
    val cp = graft.ops.Similarity.cosineNearDupPairs(
      embDf, "vec_id", "v", dim = 64, threshold = 0.9, nBits = 8)
      .queryExecution.executedPlan.toString
    assert(cp.contains("vec_dot("),
      "cosine near-dup plan lost its native signature expression (pin vacuous)")
    val cbad = cp.linesIterator
      .filter(l => l.contains("Filter") && l.contains("vec_dot("))
    assert(cbad.isEmpty,
      s"cosine near-dup re-evaluates signatures inside a filter:\n${cbad.mkString("\n")}")
  }

  test("quantile filter's threshold join-back is the small side (no fact-side rebuild)") {
    // the per-stratum threshold table is an aggregate of the input; the
    // join back must not plan the AGGREGATE as the streamed/probe side
    // of a nested loop — hash/sort-merge keyed on the stratum is the pin
    val p = planOf("pipe_quantile_filter")
    assert(p.contains("Join") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"quantile filter join shape regressed:\n$p")
  }

  test("delete-free lake scan is one relation, not a per-file union") {
    val p = planOf("lake_scan_agg")
    assert(!p.contains("Union"),
      s"delete-free lake scan degraded to a per-file union:\n$p")
  }

  test("the guard flips when broadcast planning is disabled (not vacuous)") {
    // Option(…) inside: adaptive.autoBroadcastJoinThreshold defaults to a
    // NULL value — it must round-trip as unset, not as set(null)
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(Option(spark.conf.get(k))).toOption.flatten)
    try {
      saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
      val p = planOf("q08_market_share")
      assert(!p.contains("BroadcastHashJoin"),
        "disabling broadcast thresholds must remove the static broadcast " +
          s"join, or this guard tests nothing:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
