#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
testdata parquet tables, loads the Spark result parquet written by
graft.Verify, and compares (columns sorted by name, rows sorted, exact
values). Usage:

    python3 tools/check.py [sfDir] [outDir]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable sort/hash regardless of dtype quirks
    s = df.copy()
    for c in s.columns:
        col = s[c]
        if col.dtype == object:
            s[c] = col.astype(str)
        elif np.issubdtype(col.dtype, np.floating):
            s[c] = col.map(lambda v: "NULL" if pd.isna(v) else repr(float(v)))
        else:
            s[c] = col.astype(str)
    s = s.sort_values(by=list(s.columns), kind="mergesort").reset_index(drop=True)
    return s


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        if g.equals(e):
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            diff = (g != e)
            ncell = int(diff.values.sum())
            print(f"FAIL {name}: {ncell} mismatched cells of {g.size}")
            mask = diff.any(axis=1)
            print("  spark:", g[mask].head(3).to_dict("records"))
            print("  duckdb:", e[mask].head(3).to_dict("records"))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
