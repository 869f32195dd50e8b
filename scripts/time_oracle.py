#!/usr/bin/env python3
"""Record per-query DuckDB wall times for the oracle SQL of a Verify dump.

The reference benchmark's headline metric is the per-query ratio of
engine time to DuckDB time on the same data (benchmark/src/main.rs:154-164,
report.rs:46-58). graft.Bench consumes the files this script writes
(bench/duckdb_times_sf<sf>.json, bench/duckdb_times_scale10.json) and
emits those ratios in bench.json, so the cross-engine comparison is a
recorded number, not an argument.

Usage:
  python3 scripts/time_oracle.py <dataDir> <verifyOutDir> [destJson]
      [--only=<prefix>[,<prefix>...]] [--marker=<markerFile>]

<dataDir> may hold each table as a single parquet FILE (the raw driver
fixtures) or as a DIRECTORY of part files (the staged bench layout /
the scale10 corpus) — directories are read with a glob. --only filters
oracle queries by name prefix (e.g. --only=q for the TPC-H shapes).
--marker embeds the given staging-marker file's content as
`layout_fingerprint`, which graft.Bench checks against the live layout
so a recording from an older fixture generation is flagged stale.

Protocol: per query, one warmup execution then min of 3 timed
executions, each a full execute+fetchall (DuckDB plans lazily, so the
fetch IS the execution). Views over the same parquet files Spark reads.
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--")
                and not a.startswith("--sub="))
    # --sub=NAME:OLD:NEW (repeatable): literal substring replacement in one
    # query's SQL before timing. Used by the scale10 recording to scale
    # scale-sensitive literals (q20's HAVING qty > 50 passes every supplier
    # at 10x replication) identically to ScaleBench's Spark side; the
    # substitutions are recorded in the payload for auditability.
    subs = [a[len("--sub="):].split(":", 2)
            for a in sys.argv[1:] if a.startswith("--sub=")]
    sf_dir, out_dir = pos[0], pos[1]
    dest = pos[2] if len(pos) > 2 else f"{out_dir}/duckdb_times.json"
    prefixes = opts["only"].split(",") if "only" in opts else None
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times, skipped = {}, []
    for name in sorted(oracle):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        sql = oracle[name]
        for s_name, s_old, s_new in subs:
            if s_name == name:
                assert s_old in sql, f"--sub: {s_old!r} not in {name}"
                sql = sql.replace(s_old, s_new)
        try:
            con.execute(sql).fetchall()  # warmup (page cache, catalog)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 4)
            print(f"{name}: {best:.3f} s")
        except Exception as e:
            skipped.append(name)
            print(f"SKIP {name}: {e}")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    payload = {
        "sf": sf,
        "sf_dir": sf_dir,
        "recorded_unix": int(time.time()),
        "duckdb_version": duckdb.__version__,
        "threads": os.cpu_count(),
        "protocol": "per query: 1 warmup, then min of 3 execute+fetchall",
        "skipped": skipped,
        "substitutions": {n: f"{o} -> {w}" for n, o, w in subs},
        "times": times,
    }
    if "marker" in opts:
        payload["layout_fingerprint"] = open(opts["marker"]).read()
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with open(dest, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {dest} ({len(times)} queries, {len(skipped)} skipped)")


if __name__ == "__main__":
    main()
