#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (NOT part of the library).

Usage: python3 tools/selfcheck.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran. Loads each
<outdir>/<name> parquet (Spark result), runs <outdir>/oracle_sql.json in DuckDB
against the sfdir tables, sorts columns by name + rows by all columns, and
compares values (exact for ints/strings, tiny tolerance report for floats).
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = normalize(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = normalize(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = []
        if list(spark_df.columns) != list(duck_df.columns):
            problems.append(f"columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            problems.append(f"rows {len(spark_df)} vs {len(duck_df)}")
        else:
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                if str(a.dtype) != str(b.dtype):
                    problems.append(f"dtype[{c}] {a.dtype} vs {b.dtype}")
                if a.dtype.kind == "f":
                    if not np.allclose(a.fillna(np.nan), b.fillna(np.nan), rtol=0, atol=0, equal_nan=True):
                        mx = float(np.nanmax(np.abs(a.to_numpy() - b.to_numpy()))) if len(a) else 0
                        problems.append(f"float[{c}] max_abs_diff={mx}")
                else:
                    if not a.equals(b):
                        neq = (a != b)
                        problems.append(f"value[{c}] first diff at row {neq.idxmax()}: {a[neq].head(2).tolist()} vs {b[neq].head(2).tolist()}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    # queries without oracle: rows-only
    for d in sorted(os.listdir(outdir)):
        if os.path.isdir(os.path.join(outdir, d)) and d not in oracles:
            files = glob.glob(f"{outdir}/{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {d}: {n}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
