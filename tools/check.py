#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>.parquet result written by graft.Verify, runs the
matching oracle_sql.json entry in DuckDB against the same sf parquet
tables, and compares: schema (column names sorted), row count, and
values (rows sorted, column order by name). Exact match required except
timestamps compared at microsecond precision.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.floor("us")
        # normalize int dtypes
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list,)) else v)
        try:
            import numpy as np
            if isinstance(df[c].iloc[0] if len(df) else None, np.ndarray):
                df[c] = df[c].apply(tuple)
        except Exception:
            pass
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    names = sorted(os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(p))
    # a query that threw inside graft.Verify writes no result dir at all;
    # surface it as a failure instead of silently shrinking the denominator
    for missing in sorted(set(oracle) - set(names)):
        results[missing] = "MISSING_RESULT (query threw in graft.Verify?)"
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pq.read_table(files[0]).to_pandas()
        if name not in oracle:
            results[name] = f"ROWS_ONLY({len(got)})"
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_ERR: {e}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} oracle={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT spark={len(g)} oracle={len(e)}"
        else:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
                results[name] = "OK"
            except AssertionError as ex:
                results[name] = "VALUE_MISMATCH: " + str(ex).replace("\n", " | ")[:400]
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        flag = "PASS" if (v == "OK" or v.startswith("ROWS_ONLY")) else "FAIL"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
