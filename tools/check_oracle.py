#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

For each query dir under verifyOutDir (written by graft.Verify), loads the
Spark parquet result, runs the matching oracle SQL from oracle_sql.json in
DuckDB (with each testdata table registered as a view), sorts columns by
name, and compares cell values exactly (doubles compared bit-for-bit after
float64 normalization — the queries are built to be hash-stable).

The driver's hash is type/format-tagged, so value equality alone is not
enough to predict a green driver row (round-13 lesson: `pack_sequences`
had cell-identical values but a HUGEINT oracle column, and
`scalar_decimal` hit an exact round-half tie whose direction differs
across engines). This checker therefore ALSO:

  1. compares the TYPE CLASS of every column between the Spark parquet
     output and the DuckDB oracle result (int vs hugeint vs float vs
     decimal-with-scale) and FAILS on divergence — an oracle HUGEINT
     (DuckDB's sum(BIGINT) default) must be CAST to BIGINT;
  2. WARNS when an oracle uses round() to produce a DECIMAL column —
     exact-decimal arithmetic can land exactly on a half boundary and
     the tie direction is engine/version-specific; emit the unrounded
     exact sum instead (round() on DOUBLE is fine: libm outputs are
     essentially never exact binary halves).
"""
import json
import math
import os
import re
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_class(duck_type):
    """Collapse a DuckDB type name to the class the driver's hash tags.

    int widths all render identically (1 is 1), so TINYINT..BIGINT are one
    class; HUGEINT is its own class (int128 renders differently in the
    driver's hash pipeline); DECIMAL keeps its scale (67.50 vs 67.5).
    """
    t = str(duck_type).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    m = re.match(r"DECIMAL\(\s*\d+\s*,\s*(\d+)\s*\)", t)
    if m:
        return f"decimal(s={m.group(1)})"
    if t.startswith("DECIMAL"):
        return "decimal(s=?)"
    if t == "BOOLEAN":
        return "bool"
    if t in ("VARCHAR", "TEXT", "STRING", "BLOB"):
        return "str"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t


# Pairings the driver's hash provably tolerates (round-11/12 data
# points): Decimal('0.0') vs float 0.0 hashed EQUAL in the ddl gates.
_COMPAT = {frozenset(["float", "decimal(s=1)"])}


def classes_compatible(a, b):
    if a == b:
        return True
    return frozenset([a, b]) in _COMPAT


def norm(v):
    # Emulate the driver's string-shaped hash: int 1 and float 1.0 hash
    # DIFFERENT (round-11 dialect_scalar_misc red row). Decimal goes via
    # float64 for VALUE comparison only — scale drift is caught by the
    # separate type-class gate above, not silently collapsed here.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return str(v)
    if isinstance(v, Decimal):
        return str(float(v))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    return v


def _cast_inners(sql):
    """Yield (inner_expr, target_type) for every CAST(expr AS type)."""
    up = sql.upper()
    out = []
    i = 0
    while True:
        j = up.find("CAST", i)
        if j < 0:
            break
        k = sql.find("(", j)
        if k < 0:
            break
        depth, m = 1, k + 1
        while m < len(sql) and depth:
            if sql[m] == "(":
                depth += 1
            elif sql[m] == ")":
                depth -= 1
            m += 1
        body = sql[k + 1:m - 1]
        # split on the LAST top-level " AS "
        depth, asat = 0, -1
        for x in range(len(body) - 3):
            ch = body[x]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and body[x:x + 4].upper() == " AS ":
                asat = x
        if asat >= 0:
            out.append((body[:asat].strip(), body[asat + 4:].strip()))
        i = j + 4
    return out


def decimal_double_risk(sql):
    """Static version-risk rule (round-14 scalar_decimal lesson).

    DuckDB backs DECIMAL(p>18) by int128, and sum() promotes both
    integer and decimal inputs to int128 (HUGEINT / DECIMAL(38,s)).
    The int128->binary64 conversion routine CHANGED across DuckDB
    releases, so a cell that is bit-identical on the local DuckDB can
    hash-differ on the driver's. Flag every CAST(expr AS DOUBLE/FLOAT)
    whose expr is int128-backed, unless the expr is first narrowed to
    an int64-backed type (CAST(... AS BIGINT) / DECIMAL(p<=18)), whose
    double conversion is exact and version-independent.
    """
    hits = []
    for inner, target in _cast_inners(sql):
        t = target.upper()
        if not (t.startswith("DOUBLE") or t.startswith("FLOAT")
                or t.startswith("REAL")):
            continue
        iu = inner.upper()
        if re.match(r"^CAST\s*\(.*\sAS\s+(BIGINT|INTEGER|SMALLINT|"
                    r"TINYINT)\s*\)$", iu, re.DOTALL):
            continue
        m = re.match(r"^CAST\s*\(.*\sAS\s+DECIMAL\s*\(\s*(\d+)", iu,
                     re.DOTALL)
        if m and int(m.group(1)) <= 18:
            continue
        wide = any(int(p) > 18
                   for p in re.findall(r"DECIMAL\s*\(\s*(\d+)", iu))
        if wide or re.search(r"\bSUM\s*\(", iu):
            hits.append(f"CAST({inner[:60]} AS {target})")
    return hits


def wide_decimal_output_risk(ecols, ecol_types):
    """Static version-risk rule (round-15 scalar_decimal lesson).

    Three rounds of CAST-side fixes were bit-identical on local DuckDB
    yet red at the driver — the surviving channel was the OUTPUT
    columns themselves: DECIMAL(p>18) is int128-backed and the value
    travels through driver-side decimal conversion that changed across
    DuckDB releases, even when every CAST inside the query is
    version-safe. Flag every p>18 decimal RESULT column; narrow the
    final schema to DECIMAL(p<=18) on both sides.
    """
    hits = []
    for c, t in zip(ecols, ecol_types):
        m = re.match(r"DECIMAL\s*\(\s*(\d+)", str(t).upper())
        if m and int(m.group(1)) > 18:
            hits.append(f"{c}: {t}")
    return hits


def _split_top(expr, seps):
    """Split expr on top-level (depth-0) single-char separators."""
    parts, depth, cur = [], 0, []
    for ch in expr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0 and ch in seps:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def wide_decimal_multiply_risk(sql):
    """Flag decimal multiply chains whose inferred result precision
    exceeds 38 — the territory where each engine applies its OWN
    overflow adjustment (precision clamp / scale reduction) with
    engine-specific rounding. Approximate inference per CAST inner:
    split on top-level '*'; a factor's precision is the max DECIMAL
    precision inside it, +1 if the factor itself adds/subtracts
    (DuckDB add = max(p)+1); product precision = sum(factors)+(n-1).
    """
    hits = []
    for inner, _target in _cast_inners(sql):
        factors = _split_top(inner, "*")
        if len(factors) < 2:
            continue
        total, ok = len(factors) - 1, True
        for f in factors:
            ps = [int(p) for p in re.findall(r"DECIMAL\s*\(\s*(\d+)", f,
                                             re.IGNORECASE)]
            if not ps:
                ok = False
                break
            total += max(ps) + (1 if any(
                s.strip() for s in _split_top(f, "+-")[1:]) else 0)
        if ok and total > 38:
            hits.append(f"precision~{total}: {inner[:60]}")
    return hits


def round_decimal_risk(sql, ecol_types):
    """True if the oracle SQL uses round() AND emits a DECIMAL column —
    the combination that produced the r13 scalar_decimal half-tie."""
    if not re.search(r"\bround\s*\(", sql, re.IGNORECASE):
        return False
    return any(str(t).upper().startswith("DECIMAL") for t in ecol_types)


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
    n_pass = n_fail = n_weak = n_warn = 0
    for name in names:
        got = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        order = sorted(range(len(got.columns)),
                       key=lambda i: got.columns[i])
        gcols = [got.columns[i] for i in order]
        gtypes = [got.types[i] for i in order]
        grows = [tuple(norm(v) for v in r) for r in
                 got.project(", ".join(f'"{c}"' for c in gcols)).fetchall()]
        if name not in oracle:
            n_weak += 1
            status = "WEAK" if len(grows) > 0 else "WEAK-EMPTY"
            print(f"{status:10s} {name}: rows={len(grows)} (no oracle)")
            continue
        try:
            exp = con.sql(oracle[name])
            eorder = sorted(range(len(exp.columns)),
                            key=lambda i: exp.columns[i])
            ecols = [exp.columns[i] for i in eorder]
            etypes = [exp.types[i] for i in eorder]
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
        # --- type-class gate: predicts the driver's type-tagged hash ---
        tbad = []
        for c, gt, et in zip(gcols, gtypes, etypes):
            gc, ec = type_class(gt), type_class(et)
            if ec == "hugeint":
                tbad.append(f"{c}: oracle emits HUGEINT (spark {gt}) — "
                            f"CAST the oracle aggregate to BIGINT")
            elif not classes_compatible(gc, ec):
                tbad.append(f"{c}: spark {gt}({gc}) vs oracle {et}({ec})")
        if tbad:
            n_fail += 1
            print(f"TYPEFAIL   {name}: " + "; ".join(tbad))
            continue
        if round_decimal_risk(oracle[name], etypes):
            n_warn += 1
            print(f"TIE-RISK   {name}: oracle round() feeds a DECIMAL "
                  f"column — half-boundary tie direction is "
                  f"engine-specific; emit the unrounded exact value")
        vrisk = decimal_double_risk(oracle[name])
        if vrisk:
            n_warn += 1
            print(f"VER-RISK   {name}: int128-backed expr cast to "
                  f"DOUBLE/FLOAT (DuckDB int128->double conversion is "
                  f"version-dependent) — narrow to BIGINT/DECIMAL(<=18) "
                  f"first: {vrisk[0]}")
        wrisk = wide_decimal_output_risk(ecols, etypes)
        if wrisk:
            n_warn += 1
            print(f"VER-RISK   {name}: DECIMAL(p>18) OUTPUT column "
                  f"(int128-backed; driver-side decimal conversion is "
                  f"version-dependent) — CAST the final column to "
                  f"DECIMAL(<=18) on both sides: {wrisk[0]}")
        mrisk = wide_decimal_multiply_risk(oracle[name])
        if mrisk:
            n_warn += 1
            print(f"VER-RISK   {name}: decimal multiply exceeds "
                  f"precision 38 (engine-specific overflow adjustment) "
                  f"— pre-narrow the operands: {mrisk[0]}")
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
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_weak} weak/rows-only, "
          f"{n_warn} tie-risk warnings ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
