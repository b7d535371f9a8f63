#!/usr/bin/env python3
"""Regenerate the dtw / dtw_path / lsh-ANN pinned oracles inside
src/main/scala/graft/PinnedOracles.scala (in place — the file holds
many other pins).

The queries are bit-deterministic (exact-decimal bucketing, canonical
tie-breaks, deterministic hash planes), but DuckDB cannot compute them
itself, so their oracles are literal expected-value tables pinned from
a verified run — the same pattern as the sys_columns catalog oracle.

Scale-aware: pass one or more VERIFY_DIR:SF_DIR pairs and the emitted
SQL discriminates on `(SELECT count(*) FROM events)`, so the same
oracle text is correct at every pinned scale (the sf0.1 full-gate
sweep then needs no pinned-oracle exclusions).

Usage:
  SPARK_GRAFT_ONLY=sf_dtw,sf_dtw_path,sim_lsh_ann \
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vd001"
  SPARK_GRAFT_ONLY=sf_dtw,sf_dtw_path,sim_lsh_ann \
    sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vd01"
  python3 tools/gen_dtw_oracle.py \
    /tmp/vd001:/root/testdata/sf0.01 /tmp/vd01:/root/testdata/sf0.1

Doubles are emitted with repr() (shortest round-trip form), which DuckDB
parses back to the identical float64 bits.
"""
import os
import re
import sys

import duckdb

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/scala/graft/PinnedOracles.scala")


def fetch(con, verify_dir):
    dtw = con.sql(f"SELECT user_id, dtw FROM "
                  f"read_parquet('{verify_dir}/sf_dtw/*.parquet') "
                  f"ORDER BY user_id").fetchall()
    path = con.sql(f"SELECT user_id, path_len, path_md5 FROM "
                   f"read_parquet('{verify_dir}/sf_dtw_path/*.parquet') "
                   f"ORDER BY user_id").fetchall()
    ann = con.sql(f"SELECT q_id, rank, cand_id, cosine FROM "
                  f"read_parquet('{verify_dir}/sim_lsh_ann/*.parquet') "
                  f"ORDER BY q_id, rank").fetchall()
    assert dtw and path and ann, f"empty verify output in {verify_dir}"
    return dtw, path, ann


def branch(rows_sql, alias_cols, n_events):
    return (f"SELECT * FROM (VALUES\n{rows_sql})\n"
            f"          AS {alias_cols}\n"
            f"          WHERE (SELECT count(*) FROM events) = {n_events}")


def pinned(select_cols, branches, order_by):
    body = "\n          UNION ALL\n          ".join(branches)
    sql = (f"SELECT {select_cols}\n"
           f"          FROM (\n          {body}) u\n"
           f"          ORDER BY {order_by}")
    # JVM string constants cap at 64 KiB UTF-8: emit the SQL as chunked
    # triple-quoted literals joined at class-init time
    chunks, cur = [], []
    size = 0
    for line in sql.split("\n"):
        if size + len(line) > 50000:
            chunks.append("\n".join(cur)); cur, size = [], 0
        cur.append(line); size += len(line) + 1
    chunks.append("\n".join(cur))
    lits = ",\n".join(f'      """{c}"""' for c in chunks)
    joiner = '.mkString("' + '\\' + 'n")'
    return "    Seq(\n" + lits + ")" + joiner


def splice(src, val_name, sql_block):
    # replace from `  val <name>: String =` through its closing `"""`
    pat = re.compile(
        r'  val ' + val_name +
        r': String =\n(?:    """.*?"""|    Seq\(.*?\)\.mkString\([^)]*\))',
        re.DOTALL)
    assert pat.search(src), f"val {val_name} not found"
    # lambda replacement: re.sub would otherwise interpret backslash
    # escapes inside the emitted Scala (e.g. the mkString("\n") joiner)
    return pat.sub(lambda m: f'  val {val_name}: String =\n{sql_block}',
                   src, count=1)


def main(pairs):
    con = duckdb.connect()
    scales = []  # (n_events, dtw, path, ann)
    for pair in pairs:
        vdir, sfdir = pair.split(":")
        n_events = con.sql(
            f"SELECT count(*) FROM "
            f"read_parquet('{sfdir}/events.parquet')").fetchone()[0]
        scales.append((n_events,) + fetch(con, vdir))

    dtw_b, path_b, ann_b = [], [], []
    for n, dtw, path, ann in scales:
        dtw_rows = ",\n".join(f"            ({u}, {v!r})" for u, v in dtw)
        path_rows = ",\n".join(f"            ({u}, {c}, '{h}')"
                               for u, c, h in path)
        ann_rows = ",\n".join(f"            ({q}, {r}, {c}, {v!r})"
                              for q, r, c, v in ann)
        dtw_b.append(branch(dtw_rows, "t(user_id, dtw)", n))
        path_b.append(branch(path_rows, "t(user_id, path_len, path_md5)", n))
        ann_b.append(branch(ann_rows, "t(q_id, rank, cand_id, cosine)", n))

    src = open(OUT).read()
    src = splice(src, "sfDtw", pinned(
        "CAST(user_id AS BIGINT) AS user_id,\n"
        "            CAST(dtw AS DOUBLE) AS dtw",
        dtw_b, "user_id"))
    src = splice(src, "sfDtwPath", pinned(
        "CAST(user_id AS BIGINT) AS user_id,\n"
        "            CAST(path_len AS INT) AS path_len, path_md5",
        path_b, "user_id"))
    src = splice(src, "simLshAnn", pinned(
        "CAST(q_id AS BIGINT) AS q_id, CAST(rank AS INT) AS rank,\n"
        "            CAST(cand_id AS BIGINT) AS cand_id,\n"
        "            CAST(cosine AS DOUBLE) AS cosine",
        ann_b, "q_id, rank"))
    with open(OUT, "w") as f:
        f.write(src)
    print(f"wrote {os.path.normpath(OUT)}: "
          + "; ".join(f"events={n}: {len(d)} dtw, {len(p)} path, "
                      f"{len(a)} ann" for n, d, p, a in scales))


if __name__ == "__main__":
    main(sys.argv[1:])
