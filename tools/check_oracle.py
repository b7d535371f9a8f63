#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

For each query dir under verifyOutDir (written by graft.Verify), loads the
Spark parquet result, runs the matching oracle SQL from oracle_sql.json in
DuckDB (with each testdata table registered as a view), sorts columns by
name, and compares cell values exactly (doubles compared bit-for-bit after
float64 normalization — the queries are built to be hash-stable).
"""
import json
import math
import os
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Emulate the driver's string-shaped hash: int 1 and float 1.0 hash
    # DIFFERENT (round-11 dialect_scalar_misc red row), but
    # Decimal('0.0') and float 0.0 hash EQUAL (the ddl gates were green
    # with exactly that pairing). str() reproduces both data points;
    # a raw == compare would miss the first, a type-tagged compare
    # would false-fail the second.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return str(v)
    if isinstance(v, Decimal):
        # via float64 so Decimal('0.0') == 0.0 and scale differences
        # (67.50 vs 67.5) collapse; local stand-in only — fine at the
        # <=15-significant-digit magnitudes the queries emit
        return str(float(v))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    return v


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_weak = 0
    for name in names:
        got = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        gcols = sorted(got.columns)
        grows = [tuple(norm(v) for v in r) for r in
                 got.project(", ".join(f'"{c}"' for c in gcols)).fetchall()]
        if name not in oracle:
            n_weak += 1
            status = "WEAK" if len(grows) > 0 else "WEAK-EMPTY"
            print(f"{status:10s} {name}: rows={len(grows)} (no oracle)")
            continue
        try:
            exp = con.sql(oracle[name])
            ecols = sorted(exp.columns)
            erows = [tuple(norm(v) for v in r) for r in
                     exp.project(", ".join(f'"{c}"' for c in ecols))
                     .fetchall()]
        except Exception as e:
            n_fail += 1
            print(f"FAIL       {name}: oracle SQL error: {e}")
            continue
        if gcols != ecols:
            n_fail += 1
            print(f"FAIL       {name}: cols spark={gcols} duckdb={ecols}")
            continue
        if len(grows) != len(erows):
            n_fail += 1
            print(f"FAIL       {name}: rowcount spark={len(grows)} "
                  f"duckdb={len(erows)}")
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows))
               if a != b]
        if bad:
            n_fail += 1
            i, a, b = bad[0]
            print(f"FAIL       {name}: {len(bad)}/{len(grows)} rows differ; "
                  f"first at {i}:\n  spark : {a}\n  duckdb: {b}")
        else:
            n_pass += 1
            print(f"PASS       {name}: rows={len(grows)}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_weak} weak/rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
