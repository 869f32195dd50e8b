#!/usr/bin/env python3
"""Record the current bench detail as the drift-gate baseline.

Reads target/bench.json (written by graft.Bench) and saves per-query
{min, stddev} to bench/baseline_sf<sf>.json. graft.Bench compares each
later run against this file and emits a `drift` section flagging only
mechanically-significant changes (> max(2*sigma, 10%, 50 ms)) — so a
verdict can separate host noise from real regressions without re-running
(the r9 q04/q16 case: min-of-5 JIT noise read as a regression).

REFRESH POLICY (r10 verdict finding 3): a baseline refreshed in the same
round as the perf changes it should police is a gate held open — the
drift section becomes definitionally clean and certifies nothing. Only
refresh at round START (before any perf work), or leave the previous
round's committed baseline in place so the next verdict adjudicates this
round's changes against it. Never re-record mid-round after intentional
perf work; the new numbers become the baseline only once the NEXT round
begins.
"""
import json, time, sys

src = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
d = json.load(open(src))
sf = d["sf"]
# cpu_x rides the baseline (r15 verdict task 2): the multi-core depletion
# adjudicator compares each later window's cpu_x against the SAME query's
# clean-run cpu_x — the signal the adjacent 1-thread probe cannot see.
queries = {
    name: {
        "min": round(s["min"], 4),
        "stddev": round(s.get("stddev", 0.0), 4),
        **({"cpu_x": round(s["cpu_x"], 2)} if s.get("cpu_x", -1) > 0 else {}),
    }
    for name, s in d["detail"].items() if s.get("min", -1) > 0
}
tpch_10x_cpu_x = {
    name: round(h["cpu_x"], 2)
    for name, h in d.get("scale10", {}).get("tpch_10x_host", {}).items()
    if h.get("cpu_x", -1) > 0
}
# the 10x suite's own {min, stddev} so the 10x adjudicator can apply the
# same min-corroboration rule the sf0.1 sweep uses
s10 = d.get("scale10", {})
tpch_10x = {
    name: {
        "min": round(t, 4),
        "stddev": round(s10.get("tpch_10x_sd", {}).get(name, 0.0), 4),
        **({"cpu_x": tpch_10x_cpu_x[name]} if name in tpch_10x_cpu_x else {}),
    }
    for name, t in s10.get("tpch_10x_sec", {}).items()
    if name != "floor_sec" and t > 0
}
dest = f"bench/baseline_sf{sf}.json"
payload = {
    "recorded_unix": int(time.time()),
    "sf": sf,
    "iters": d.get("iters"),
    "layout": d.get("layout"),
    "queries": queries,
    "tpch_10x_cpu_x": tpch_10x_cpu_x,
    "tpch_10x": tpch_10x,
}
json.dump(payload, open(dest, "w"), indent=1)
print(f"wrote {dest} ({len(queries)} queries)")
