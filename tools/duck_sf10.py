#!/usr/bin/env python3
"""Round-14: DuckDB side of the 100x crossover validation (VERDICT r13 #4).

Times the 5 worst-ratio oracles from the r13 sf1 table against the
sf10-equivalent corpus (/tmp/graft_sf10, 100x sf0.1 via the replication
laws). Min of 3 passes, same end-to-end boundary as oracle_bench.py.

Usage: python3 tools/duck_sf10.py [sfdir] [oracle_sql.json]
"""
import json
import sys
import time

import duckdb

QUERIES = ["q84_mm_png_decode", "q08_join_broadcast", "q67_string_agg",
           "q16_set_intersect", "q40_json_extract"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
    sqls = json.load(open(sys.argv[2] if len(sys.argv) > 2
                          else "/tmp/verify_q115/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet/*.parquet'")
    for name in QUERIES:
        best = None
        for _ in range(3):
            t0 = time.time()
            n = len(con.sql(sqls[name]).fetchall())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best:.3f}s rows={n}")


if __name__ == "__main__":
    main()
