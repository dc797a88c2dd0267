#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads every <name>/ parquet result written by graft.Verify plus
oracle_sql.json, runs each oracle against DuckDB views over the same
parquet tables, and compares: row count, column names, and exact values
(bitwise for floats — matching the driver's hash compare).
"""
import json, os, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                             ignore_index=True)
        if name not in oracle:
            if len(spark_df) > 0:
                print(f"SKIP {name}: no oracle (rows={len(spark_df)})")
                n_pass += 1
            else:
                print(f"FAIL {name}: no oracle and 0 rows")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            continue
        s, d = normalize(spark_df), normalize(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            continue
        bad = []
        for c in s.columns:
            sv, dv = s[c], d[c]
            if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                eq = np.array_equal(sv.astype(np.float64).values,
                                    dv.astype(np.float64).values, equal_nan=True)
            else:
                eq = sv.astype(str).equals(dv.astype(str))
            if not eq:
                bad.append(c)
        if bad:
            print(f"FAIL {name}: value mismatch in {bad}")
            for c in bad[:2]:
                mask = s[c].astype(str) != d[c].astype(str)
                print(f"  {c}: spark={s[c][mask].head(3).tolist()} duck={d[c][mask].head(3).tolist()}")
        else:
            dt = [c for c in s.columns if s[c].dtype != d[c].dtype]
            note = f" (dtype diff: {dt})" if dt else ""
            print(f"PASS {name} rows={len(s)}{note}")
            n_pass += 1
    print(f"== {n_pass}/{len(names)} pass ==")


if __name__ == "__main__":
    main()
