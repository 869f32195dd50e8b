#!/usr/bin/env python3
"""Record per-query DuckDB wall times for the oracle SQL of a Verify dump.

The reference benchmark's headline metric is the per-query ratio of
engine time to DuckDB time on the same data (benchmark/src/main.rs:154-164,
report.rs:46-58). graft.Bench consumes the file this script writes
(bench/duckdb_times_sf<sf>.json when the third argument points there) and
emits those ratios in bench.json, so the cross-engine comparison is a
recorded number, not an argument.

Usage: python3 scripts/time_oracle.py <sfDir> <verifyOutDir> [destJson]

Protocol: per query, one warmup execution then min of 3 timed
executions, each a full execute+fetchall (DuckDB plans lazily, so the
fetch IS the execution). Views over the same parquet files Spark reads.
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    dest = sys.argv[3] if len(sys.argv) > 3 else f"{out_dir}/duckdb_times.json"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times, skipped = {}, []
    for name in sorted(oracle):
        sql = oracle[name]
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
        "times": times,
    }
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with open(dest, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {dest} ({len(times)} queries, {len(skipped)} skipped)")


if __name__ == "__main__":
    main()
