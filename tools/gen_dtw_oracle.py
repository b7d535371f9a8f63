#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/PinnedOracles.scala.

The dtw / dtw_path / lsh-ANN queries are bit-deterministic
(exact-decimal bucketing, canonical tie-breaks, deterministic hash
planes), but DuckDB cannot compute them itself, so their oracles are
literal expected-value tables pinned from a verified run — the same
pattern as the sys_columns catalog oracle.

Usage:
  SPARK_GRAFT_ONLY=sf_dtw,sf_dtw_path,sim_lsh_ann \
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_dtw"
  python3 tools/gen_dtw_oracle.py /tmp/verify_dtw

Doubles are emitted with repr() (shortest round-trip form), which DuckDB
parses back to the identical float64 bits.
"""
import os
import sys

import duckdb

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/scala/graft/PinnedOracles.scala")


def main(verify_dir):
    con = duckdb.connect()
    dtw = con.sql(f"SELECT user_id, dtw FROM "
                  f"read_parquet('{verify_dir}/sf_dtw/*.parquet') "
                  f"ORDER BY user_id").fetchall()
    path = con.sql(f"SELECT user_id, path_len, path_md5 FROM "
                   f"read_parquet('{verify_dir}/sf_dtw_path/*.parquet') "
                   f"ORDER BY user_id").fetchall()
    ann = con.sql(f"SELECT q_id, rank, cand_id, cosine FROM "
                  f"read_parquet('{verify_dir}/sim_lsh_ann/*.parquet') "
                  f"ORDER BY q_id, rank").fetchall()
    assert dtw and path and ann, "empty verify output"

    dtw_rows = ",\n".join(f"            ({uid}, {v!r})" for uid, v in dtw)
    path_rows = ",\n".join(f"            ({uid}, {n}, '{h}')"
                           for uid, n, h in path)
    ann_rows = ",\n".join(f"            ({q}, {r}, {c}, {v!r})"
                          for q, r, c, v in ann)
    body = f'''package graft

/** Literal expected-value oracles for deterministic queries DuckDB
  * cannot compute itself (no DTW builtin; the LSH ANN index needs the
  * engine's exact hash planes). Regenerate with
  * `tools/gen_dtw_oracle.py` after any intentional change to those
  * lowerings; a mismatch otherwise IS the regression signal.
  */
object PinnedOracles {{

  val sfDtw: String =
    """SELECT CAST(user_id AS BIGINT) AS user_id,
            CAST(dtw AS DOUBLE) AS dtw
          FROM (VALUES
{dtw_rows}_ROWS_)
          AS t(user_id, dtw)
          ORDER BY user_id"""

  val sfDtwPath: String =
    """SELECT CAST(user_id AS BIGINT) AS user_id,
            CAST(path_len AS INT) AS path_len, path_md5
          FROM (VALUES
{path_rows}_ROWS_)
          AS t(user_id, path_len, path_md5)
          ORDER BY user_id"""

  val simLshAnn: String =
    """SELECT CAST(q_id AS BIGINT) AS q_id, CAST(rank AS INT) AS rank,
            CAST(cand_id AS BIGINT) AS cand_id,
            CAST(cosine AS DOUBLE) AS cosine
          FROM (VALUES
{ann_rows}_ROWS_)
          AS t(q_id, rank, cand_id, cosine)
          ORDER BY q_id, rank"""
}}
'''
    body = body.replace("_ROWS_)", ")")
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {os.path.normpath(OUT)}: {len(dtw)} dtw rows, "
          f"{len(path)} path rows, {len(ann)} ann rows")


if __name__ == "__main__":
    main(sys.argv[1])
