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
    total, timed_out, errors = 0.0, [], {}
    results = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        fired = threading.Event()

        def interrupt():
            fired.set()
            con.interrupt()

        timer = threading.Timer(timeout, interrupt)
        timer.start()
        try:
            con.execute(sql).fetchall()
            dt = time.time() - t0
            results[name] = dt
            total += dt
        except Exception as e:
            # only a fired timer is a timeout; anything else (SQL
            # drift, missing view) must not masquerade as one
            if fired.is_set():
                timed_out.append(name)
            else:
                errors[name] = str(e).splitlines()[0][:160]
        finally:
            timer.cancel()
        if fired.is_set():
            # the interrupt flag may land after a near-miss success and
            # would otherwise kill the NEXT query — clear it
            try:
                con.execute("SELECT 1").fetchall()
            except Exception:
                pass
    for name, dt in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{name:32s} {dt:8.2f} s")
    for name, msg in sorted(errors.items()):
        print(f"ERROR {name}: {msg}")
    print(f"\ntotal {total:.0f} s over {len(results)} queries; "
          f"interrupted at {timeout:.0f} s: {timed_out or 'none'}; "
          f"errors: {len(errors)}")
    # dd8/dd10's recursive-closure oracles are known to exceed any
    # sane timeout in DuckDB; any OTHER timeout is a perf regression
    # and must fail scripted invocations, not just print.
    expected_timeouts = {"dd8_dedup_clusters", "dd10_dedup_clusters_stars"}
    unexpected = [t for t in timed_out
                  if t.removesuffix(".parquet") not in expected_timeouts]
    if unexpected:
        print(f"UNEXPECTED TIMEOUTS: {unexpected}")
    sys.exit(1 if (errors or unexpected) else 0)


if __name__ == "__main__":
    main()
