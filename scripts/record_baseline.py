#!/usr/bin/env python3
"""Record the current bench detail as the drift-gate baseline.

Reads target/bench.json (written by graft.Bench) and saves per-query
{min, stddev} to bench/baseline_sf<sf>.json. graft.Bench compares each
later run against this file and emits a `drift` section flagging only
mechanically-significant changes (> max(2*sigma, 10%, 50 ms)) — so a
verdict can separate host noise from real regressions without re-running
(the r9 q04/q16 case: min-of-5 JIT noise read as a regression).

Run after any INTENTIONAL perf change, on an idle host:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench"
  python3 scripts/record_baseline.py
"""
import json, time, sys

src = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
d = json.load(open(src))
sf = d["sf"]
queries = {
    name: {"min": round(s["min"], 4), "stddev": round(s.get("stddev", 0.0), 4)}
    for name, s in d["detail"].items() if s.get("min", -1) > 0
}
dest = f"bench/baseline_sf{sf}.json"
payload = {
    "recorded_unix": int(time.time()),
    "sf": sf,
    "iters": d.get("iters"),
    "layout": d.get("layout"),
    "queries": queries,
}
json.dump(payload, open(dest, "w"), indent=1)
print(f"wrote {dest} ({len(queries)} queries)")
