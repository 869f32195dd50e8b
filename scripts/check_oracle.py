#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql over the same parquet tables,
compare values column-sorted (and row-sorted as a fallback).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype(float)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    return df.reset_index(drop=True)


def eq(a: pd.DataFrame, b: pd.DataFrame, sort_rows: bool) -> bool:
    if sort_rows:
        a = a.sort_values(by=list(a.columns), kind="mergesort").reset_index(drop=True)
        b = b.sort_values(by=list(b.columns), kind="mergesort").reset_index(drop=True)
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) and pd.api.types.is_float_dtype(y):
            if not np.allclose(x.fillna(1.5e308), y.fillna(1.5e308), rtol=0, atol=0):
                return False
        else:
            if not x.fillna("\0NULL").astype(str).equals(y.fillna("\0NULL").astype(str)):
                return False
    return True


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pq = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not pq:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(p) for p in sorted(pq)])
            # driver-parity tz strictness: the driver's schema compare
            # fails a tz-AWARE spark column against DuckDB's naive
            # timestamps BEFORE normalize() can hide it (this caught the
            # round-5 outputTimestampType regression only driver-side)
            tz_aware = [c for c in got.columns
                        if isinstance(got[c].dtype, pd.DatetimeTZDtype)]
            if tz_aware:
                print(f"FAIL {name}: tz-aware timestamp columns {tz_aware} "
                      "(driver schema check rejects; write timestamp_ntz)")
                n_fail += 1
                continue
            got = normalize(got)
            want = normalize(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if eq(got.copy(), want.copy(), sort_rows=False) or eq(got, want, sort_rows=True):
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: shape spark={got.shape} duckdb={want.shape}")
            print("  spark:", got.head(3).to_dict("records"))
            print("  duck :", want.head(3).to_dict("records"))
            n_fail += 1
    # queries without oracle: rows-only
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
