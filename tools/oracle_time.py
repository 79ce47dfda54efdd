#!/usr/bin/env python3
"""Time the DuckDB oracle suite at a scale factor — the comparison side
of the round's bench pair. Runs every oracle SQL from
<outDir>/oracle_sql.json against <sfDir>'s parquet tables, N passes
(default 2), reporting per-query best and the min-of-N suite total.

    python3 tools/oracle_time.py [sfDir] [outDir] [passes]
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    best = {}
    totals = []
    for _ in range(passes):
        t_suite = 0.0
        for name in sorted(oracle):
            t0 = time.monotonic()
            con.execute(oracle[name]).fetchall()
            dt = time.monotonic() - t0
            t_suite += dt
            if name not in best or dt < best[name]:
                best[name] = dt
        totals.append(t_suite)
    slow = sorted(best.items(), key=lambda kv: -kv[1])[:12]
    print(json.dumps({
        "suite_min_sec": round(min(totals), 2),
        "suite_all_sec": [round(t, 2) for t in totals],
        "n_queries": len(oracle),
        "slowest": {k: round(v, 3) for k, v in slow},
    }))
    # full per-query bests to a file for the weak-gate ledger
    # (Spark-side per-query mins live in bench_out.json)
    dest = os.environ.get("ORACLE_TIME_OUT")
    if dest:
        with open(dest, "w") as f:
            json.dump({k: round(v, 4) for k, v in best.items()}, f)


if __name__ == "__main__":
    main()
