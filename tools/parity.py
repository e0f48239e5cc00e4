#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each parquet table in
<sfDir> as a DuckDB view, runs every oracle, and compares it to the
Spark result parquet at <verifyOutDir>/<name>/ — columns sorted by
name, rows sorted, values normalised (floats rounded to 9 sig places,
timestamps to ISO micros).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.floating):
            s = s.round(9)
        elif np.issubdtype(s.dtype, np.datetime64):
            s = s.dt.floor('us').astype('datetime64[us]')
        elif s.dtype == object:
            s = s.astype(str)
        out[c] = s
    n = pd.DataFrame(out)
    n = n.sort_values(by=list(n.columns)).reset_index(drop=True)
    return n

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            oracle = con.sql(sql).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_bad += 1; continue
        try:
            got = pd.concat([pd.read_parquet(p) for p in
                             glob.glob(f"{spark_dir}/*.parquet")], ignore_index=True)
        except Exception as e:
            print(f"READ-ERR {name}: {e}"); n_bad += 1; continue
        a, b = norm(got), norm(oracle)
        if list(a.columns) != list(b.columns):
            print(f"SCHEMA   {name}: spark={list(a.columns)} oracle={list(b.columns)}")
            n_bad += 1; continue
        if len(a) != len(b):
            print(f"ROWS     {name}: spark={len(a)} oracle={len(b)}"); n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=False, rtol=1e-8, atol=1e-9)
            print(f"OK       {name} ({len(a)} rows)"); n_ok += 1
        except AssertionError as e:
            msg = str(e).splitlines()
            diff = a.compare(b) if a.shape == b.shape else None
            print(f"VALUES   {name}: {msg[0] if msg else e}")
            if diff is not None and not diff.empty:
                print(diff.head(5).to_string())
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
