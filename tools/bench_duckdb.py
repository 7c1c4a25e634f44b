#!/usr/bin/env python3
"""Reproduce the README's DuckDB throughput baseline.

Usage: python3 tools/bench_duckdb.py <verify_out_dir> <sf_dir> [per_query_timeout_s]

Runs every oracle_sql.json query (the exact SQL the correctness gate
uses) in DuckDB against the same parquet tables graft.Bench reads, and
prints per-query seconds plus the total. Queries exceeding the timeout
(default 120 s — dd10's recursive-CTE transitive closure needs it) are
interrupted and reported separately.
"""
import json, os, sys, threading, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    total, timed_out = 0.0, []
    results = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        try:
            con.execute(sql).fetchall()
            dt = time.time() - t0
            results[name] = dt
            total += dt
        except Exception:
            timed_out.append(name)
        finally:
            timer.cancel()
    for name, dt in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{name:32s} {dt:8.2f} s")
    print(f"\ntotal {total:.0f} s over {len(results)} queries; "
          f"interrupted at {timeout:.0f} s: {timed_out or 'none'}")


if __name__ == "__main__":
    main()
