package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Host-speed calibration for the bench artifacts (r13 verdict task 1):
  * the bench VM is burstable — after ~2-3 h of sustained load its CPU
  * budget depletes and identical code times 1.5-3× slower, which in r13
  * published 35 false "regressions" on unchanged code. The fix is to
  * measure the HOST, not just the engine: two fixed CPU-bound probes run
  * at bench start, are compared against a committed reference recording
  * (bench/calibration.json, taken on a known-good window), and when the
  * host measures >1.3× the reference the artifact stamps itself
  * `host_degraded: true` and the drift gate publishes "not adjudicable"
  * instead of false regressions.
  *
  * Two probes because throttling shows up differently by shape:
  *  - `st`: a single-threaded JVM integer-mix loop (pure frequency —
  *    immune to parallel scheduling noise);
  *  - `mt`: a 32-way Spark range-sum over xxhash64 (the codegen'd
  *    all-cores shape the bench queries actually run as).
  * Both are min-of-3 after a warmup, so JIT is outside the number.
  */
object Calibration {

  /** Committed reference values: (stSec, mtSec). */
  def loadRef(): Option[(Double, Double)] = try {
    val p = java.nio.file.Paths.get("bench", "calibration.json")
    if (!java.nio.file.Files.exists(p)) None
    else {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val r = m.readTree(java.nio.file.Files.readAllBytes(p))
      Some((r.get("cal_st_sec").asDouble, r.get("cal_mt_sec").asDouble))
    }
  } catch { case _: Throwable => None }

  /** Single-thread probe: 200M rounds of a xorshift-multiply mix.
    * The result is folded into a volatile sink so the JIT cannot dead-
    * code the loop.
    */
  @volatile private var sink: Long = 0L
  private def stOnce(): Double = {
    val t0 = System.nanoTime()
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < 200000000) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
      i += 1
    }
    sink = h
    (System.nanoTime() - t0) / 1e9
  }

  private def mtOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // bit_xor, not sum: summing 1e9 full-range hashes overflows Long
    // under ANSI mode
    sink = spark.range(1000000000L).select(bit_xor(xxhash64(col("id"))))
      .head().getLong(0)
    (System.nanoTime() - t0) / 1e9
  }

  /** Quick single-thread probe (1 warmup + min of 2) for scaling test
    * wall-clock budgets: a latency assertion divided by this measures
    * work, not the burstable host's current CPU budget (r13: a <1 s
    * planning gate failed at 3.36 s in a depleted window on sound code).
    */
  def stQuick(): Double = { stOnce(); math.min(stOnce(), stOnce()) }

  /** The quick probe's time on a quiet host window (measured 0.44 s
    * warm; set slightly fast so budgets only ever EXPAND under load,
    * never shrink below their quiet-host values).
    */
  val NominalStSec = 0.40

  /** Measure both probes (1 warmup + min of 3 each); returns
    * (stSec, mtSec).
    */
  def measure(spark: SparkSession): (Double, Double) = {
    stOnce(); val st = (1 to 3).map(_ => stOnce()).min
    mtOnce(spark); val mt = (1 to 3).map(_ => mtOnce(spark)).min
    (st, mt)
  }

  /** Per-window adjacency probe (r14 verdict task 2): min-of-2
    * single-thread runs, no warmup (the JIT is hot after the run-start
    * calibration). Measured ADJACENT to each query's timing window it
    * detects the sustained hypervisor steal that run-level point probes
    * miss — r14's end-of-round window read 0.99/1.26/0.99 at the three
    * calibration points while the suite between them ran at load1 16-24
    * and published 32 false regressions.
    */
  def stProbe(): Double = math.min(stOnce(), stOnce())

  /** Degradation factor of a single st probe vs the committed reference
    * (None when no reference recording exists).
    */
  def stXOf(st: Double): Option[Double] = loadRef().map(st / _._1)

  /** Record the reference (only do this on a known-good window — round
    * start, host near-idle, headline geomean in the committed bracket).
    */
  def record(st: Double, mt: Double): Unit = {
    val p = java.nio.file.Paths.get("bench", "calibration.json")
    java.nio.file.Files.createDirectories(p.getParent)
    val json = f"""{"cal_st_sec":$st%.3f,"cal_mt_sec":$mt%.3f,""" +
      f""""recorded_unix":${System.currentTimeMillis / 1000},""" +
      s""""protocol":"1 warmup + min of 3; st = 200M-round integer mix on one thread, mt = spark.range(1e9) sum(xxhash64) on local[32]"}""" +
      "\n"
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
  }

  /** Degradation factor vs the committed reference: the worse of the two
    * probe ratios (throttling may hit frequency or core budget first).
    */
  def hostX(st: Double, mt: Double): Option[Double] =
    loadRef().map { case (rs, rm) => math.max(st / rs, mt / rm) }

  /** The adjudicability threshold (r13 verdict: ">1.3× the committed
    * floor" marks the window degraded).
    */
  val DegradedAt = 1.3
}
