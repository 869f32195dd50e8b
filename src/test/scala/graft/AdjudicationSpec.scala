package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench-window adjudication (r15 verdict task 2): the host depletion
  * that contaminated four rounds of driver benches is MULTI-core — the
  * adjacent single-thread probe reads healthy while every 32-way query
  * window burns ~2× the CPU-seconds-per-wall-second of the committed
  * clean baseline at identical plans. These tests replay the REAL
  * numbers from the r15 contaminated run (`BENCH_r15.json`) against the
  * committed clean record (63a043b `bench/full_sf0.1.json`) and assert
  * the adjudicator now classifies them the way the r15 verdict demands:
  * degraded windows publish non-adjudicable, clean windows adjudicate.
  */
class AdjudicationSpec extends AnyFunSuite {

  // (query, contaminated cpu_x, contaminated st_x, clean-baseline cpu_x)
  // — verbatim from the r15 artifacts
  private val r15Contaminated = Seq(
    ("dedup_exact", 14.5, 0.99, 5.7),
    ("mm_decode_meta", 16.4, 0.99, 4.2),
    ("q05_local_supplier_volume", 14.2, 0.99, 7.6))

  test("r15 contaminated windows: st probe blind, cpu_x adjudicates degraded") {
    r15Contaminated.foreach { case (n, cpuX, stX, base) =>
      // the r14-era rule (st probe alone) reads these windows healthy —
      // exactly the failure mode that published 21 false regressions.
      // In the contaminated run the wall minima ALSO ran ~2x baseline,
      // so the min-corroboration holds (minRegressed = true).
      assert(stX <= Calibration.DegradedAt, s"$n: premise — st probe healthy")
      assert(Calibration.cpuXDegraded(cpuX, Some(base)), s"$n: cpu_x evidence")
      assert(Calibration.windowDegraded(stX, cpuX, Some(base),
        minRegressed = true), s"$n: degraded")
    }
  }

  test("healthy min at elevated cpu_x stays adjudicable (first r16 run's q02/q14)") {
    // real numbers from the first r16 production run: q02 cpu_x 12.2 vs
    // base 8.1 (1.51x), q14 13.4 vs 8.3 (1.61x) — but both minima sat
    // exactly ON baseline (0.286 vs 0.289, 0.098 vs 0.103). A min at
    // baseline is direct evidence the number is fine; cpu_x alone is
    // GC/stage-overlap-noisy on sub-0.3s windows and must not flag it.
    Seq(("q02", 12.2, 0.99, 8.1), ("q14", 13.4, 0.98, 8.3)).foreach {
      case (n, cpuX, stX, base) =>
        assert(!Calibration.windowDegraded(stX, cpuX, Some(base),
          minRegressed = false), s"$n must stay adjudicable")
    }
  }

  test("a retime landing back inside baseline tolerance cleanses despite cpu_x") {
    assert(Calibration.windowClean(stX = 1.0, cpuX = 13.0, baseCpuX = Some(8.0),
      timeAtBaseline = true))
    assert(!Calibration.windowClean(stX = 1.0, cpuX = 13.0, baseCpuX = Some(8.0),
      timeAtBaseline = false))
  }

  test("clean windows adjudicate: committed-run cpu_x vs its own baseline") {
    // a clean run re-measured against its own recording must not flag
    // (cpu_x run-to-run variance is well under the 1.5x factor)
    Seq(("dedup_exact", 5.7, 0.98, 5.7), ("q01_pricing_summary", 11.3, 0.99, 11.3),
        ("q18_large_orders", 9.3, 1.07, 9.3)).foreach { case (n, cpuX, stX, base) =>
      assert(!Calibration.windowDegraded(stX, cpuX, Some(base)), s"$n clean")
      assert(Calibration.windowClean(stX, cpuX, Some(base)), s"$n cleanses")
    }
  }

  test("a retime on the still-depleted window cannot cleanse") {
    // r15's dedup_exact retime ran in the same contaminated session:
    // retime st_x 1.00 (healthy-looking) — under the cpu_x axis the
    // retime window reads degraded too, so the query stays excluded
    assert(!Calibration.windowClean(stX = 1.00, cpuX = 14.0, baseCpuX = Some(5.7)))
  }

  test("failed or reference-less probes never cleanse (r15 advice guard)") {
    assert(!Calibration.windowClean(stX = -1.0, cpuX = 5.0, baseCpuX = Some(5.7)))
    assert(!Calibration.windowClean(stX = -1.0, cpuX = 5.0, baseCpuX = None))
  }

  test("no baseline cpu_x = no multi-core evidence (pre-r15 behavior holds)") {
    assert(!Calibration.cpuXDegraded(20.0, None))
    assert(!Calibration.windowDegraded(stX = 1.0, cpuX = 20.0, baseCpuX = None))
    // frequency-class depletion still caught by the st axis
    assert(Calibration.windowDegraded(stX = 1.8, cpuX = 20.0, baseCpuX = None))
  }

  test("unmeasurable window cpu_x (-1) is not evidence") {
    assert(!Calibration.cpuXDegraded(-1.0, Some(5.7)))
  }

  // --- cross-run geomean ratchet (r16): replay of the real artifacts.
  // The 2026-08-17 00:24 run validated on every within-run axis
  // (host_degraded false, nonadj 0, drift reg 2) yet measured geomean
  // 8.05 vs the incumbent record's 6.34 at the SAME DuckDB recording —
  // a 27% uniform per-core host slowdown no probe axis can see.
  private def artifact(geo: Double, rec: Long): String =
    s"""{"scale10":{"vs_duckdb_10x":{"recorded_unix":$rec,"duckdb_version":"1.0.0","n":22,"geomean":$geo,"median":$geo}}}"""

  test("ratchet: a >10% worse validated run at the same recording diverts") {
    val r = Calibration.geomeanRatchet(
      Some(artifact(6.34, 1786839843L)), artifact(8.05, 1786839843L))
    assert(r.contains((6.34, 8.05)))
  }

  test("ratchet: a better or within-10% run refreshes the record") {
    assert(Calibration.geomeanRatchet(
      Some(artifact(6.34, 1786839843L)), artifact(5.19, 1786839843L)).isEmpty)
    assert(Calibration.geomeanRatchet(
      Some(artifact(6.34, 1786839843L)), artifact(6.90, 1786839843L)).isEmpty)
  }

  test("ratchet: a changed DuckDB recording disables the comparison") {
    assert(Calibration.geomeanRatchet(
      Some(artifact(6.34, 1786839843L)), artifact(8.05, 1786900000L)).isEmpty)
  }

  test("ratchet: no incumbent or unparseable incumbent always refreshes") {
    assert(Calibration.geomeanRatchet(None, artifact(8.05, 1L)).isEmpty)
    assert(Calibration.geomeanRatchet(Some("{}"), artifact(8.05, 1L)).isEmpty)
  }

  test("ratchet: whitespace-tolerant parse (re-indented side files)") {
    val spaced = s"""{"vs_duckdb_10x": {"recorded_unix": 42, "geomean": 6.34}}"""
    assert(Calibration.tenXGeo(spaced).contains((6.34, 42L)))
  }
}
