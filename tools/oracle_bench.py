#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB → ORACLE_BENCH.json (NOT part of the library).

Usage: python3 tools/oracle_bench.py [sfdir] [outdir] [dest]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran (the
oracle_sql.json there carries the __GRAFT_VERIFY_OUT__ substitution, so the
PQ cached-codebook oracles resolve). Each oracle runs `passes` times
(default 2) and the MIN is recorded — DuckDB has no JIT warmup, but the
first pass pays parquet-footer/OS-cache effects.

graft.Bench reads the dest file and emits per-query spark/duckdb ratios in
BENCH_LOCAL.json (VERDICT r5 item 1: make the 2x-of-baseline bar auditable
per query). Times here are END-TO-END (parse+plan+execute+fetch), the same
boundary Bench times for Spark (plan+execute+count).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    dest = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/ORACLE_BENCH.json"
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    times = {}
    for name in sorted(oracles):
        best = None
        for _ in range(passes):
            t0 = time.time()
            try:
                con.sql(oracles[name]).fetchall()
                dt = time.time() - t0
            except Exception as e:
                print(f"ERR {name}: {e}")
                dt = -1.0
                break
            best = dt if best is None else min(best, dt)
        times[name] = round(best if best is not None else -1.0, 4)
        print(f"{name}: {times[name]}s")
    rec = {"sf": sfdir, "duckdb": duckdb.__version__, "passes": passes,
           "unit": "sec", "queries": times}
    with open(dest, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(f"wrote {dest} ({len(times)} queries, total "
          f"{sum(v for v in times.values() if v > 0):.1f}s)")


if __name__ == "__main__":
    main()
