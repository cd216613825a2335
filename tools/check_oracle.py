#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <out>/oracle_sql.json, runs each SQL in DuckDB over the parquet
tables in <sf_dir>, reads the Spark result from <out>/<name>/*.parquet,
sorts columns by name + rows by all columns, and compares values.
"""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pq.read_table(files[0]).to_pandas())
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            g, e = got[c], exp[c]
            if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(e):
                eq = (g.values == e.values) | (pd.isna(g.values) & pd.isna(e.values))
            else:
                eq = (g.astype(str).values == e.astype(str).values)
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}[row{i}]: {g.iloc[i]!r} vs {e.iloc[i]!r}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
