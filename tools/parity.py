#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each parquet table in
<sfDir> as a DuckDB view, runs every oracle, and compares it to the
Spark result parquet at <verifyOutDir>/<name>/ — columns sorted by
name, rows sorted, values normalised (floats rounded to 9 sig places,
timestamps to ISO micros).

Two hard lessons from round 8 are baked in (VERDICT r8 #1/#2):

 1. TYPE PRE-PASS: every oracle is BOUND (not executed) first and its
    result types checked against the closed set Spark can emit.
    DuckDB's sum(BIGINT) is HUGEINT; pandas coerces HUGEINT to
    float64, the driver's hash then disagrees with Spark's int64
    even when every value matches. An oracle that leaks HUGEINT (or
    any unexpected type) now FAILS LOUDLY here, before any value
    comparison — the exact class that shipped two red gates in r8.

 2. DTYPE-STRICT COMPARE: the value comparison normalises only
    int widths (int8/16/32 -> int64) and float32 -> float64, then
    asserts with check_dtype=True. float-vs-int is a FAILURE — the
    old check_dtype=False silently tolerated the HUGEINT coercion,
    so "green locally" did not predict the driver's verdict.
"""
import json, sys, glob, os, re
import duckdb
import pandas as pd
import numpy as np

# The closed set of DuckDB result types a correct oracle may produce —
# everything here maps 1:1 onto a type Spark emits and survives the
# DuckDB -> pandas -> hash path without coercion surprises. Notably
# ABSENT: HUGEINT/UHUGEINT (sum() promotion; becomes float64 in
# pandas), UINTEGER/UBIGINT (no Spark unsigned types), INTERVAL.
ALLOWED_TYPES = re.compile(
    r"^(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|VARCHAR|DATE|"
    r"BOOLEAN|TIMESTAMP( WITH TIME ZONE)?|DECIMAL\(\d+,\d+\))$")

def typecheck(con, oracles):
    """Bind every oracle and reject disallowed result column types.
    Binding resolves the full type tree without executing the query,
    so this pre-pass is cheap even for the expensive gates. Returns
    the SET of flagged oracle names — each counts as one failure and
    is excluded from the value loop (a flagged oracle must never also
    print OK: pandas' coercion is exactly what makes its value compare
    meaningless)."""
    bad = {}
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:
            bad.setdefault(name, []).append(f"bind error: {e}")
            continue
        for c, t in cols:
            if not ALLOWED_TYPES.match(t):
                bad.setdefault(name, []).append(
                    f"column '{c}' has disallowed type {t} "
                    "(un-cast sum()? HUGEINT never survives "
                    "the pandas hash path — CAST it)")
    for name, msgs in sorted(bad.items()):
        for msg in msgs:
            print(f"TYPE     {name}: {msg}")
    return set(bad)

def norm(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns/rows and normalise REPRESENTATION only: int widths
    to int64, float32 to float64, tz-naive micros for timestamps,
    objects to str. Deliberately does NOT bridge float-vs-int — that
    divergence is a real schema bug the driver would flag."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if not isinstance(s.dtype, np.dtype):
            # pandas extension dtype (nullable Int64/Float64/boolean):
            # null-free ints -> int64, else float64 — the same coercion
            # both engines' null-bearing BIGINTs get on the numpy path
            if pd.api.types.is_integer_dtype(s.dtype):
                s = (s.astype("int64") if not s.isna().any()
                     else s.astype("float64"))
            elif pd.api.types.is_float_dtype(s.dtype):
                s = s.astype("float64")
        if pd.api.types.is_bool_dtype(s.dtype):
            # ONE normal form for every boolean representation (numpy
            # bool, extension boolean, object bools hit this via the
            # map): 'True'/'False'/'None' — numpy bool vs extension
            # '<NA>' strings would otherwise be three different forms
            # of the same logical column under check_dtype=True
            s = s.map(lambda x: "None" if pd.isna(x) else str(bool(x)))
        if np.issubdtype(s.dtype, np.floating):
            s = s.astype("float64").round(9)
        elif np.issubdtype(s.dtype, np.integer):
            s = s.astype("int64")
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
    flagged = typecheck(con, oracles)
    n_bad = len(flagged)
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        if name in flagged:
            continue  # one failure per flagged oracle, never also OK
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
            # check_dtype defaults to True: a float64 column on one side
            # and int64 on the other FAILS even when values agree — the
            # r8 skew_summary/graph_pagerank class dies here
            pd.testing.assert_frame_equal(a, b,
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
