#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/PinnedOracles.scala.

The dtw / dtw_path queries are bit-deterministic (exact-decimal hourly
buckets, canonical diagonal-first tie-break), but DuckDB has no DTW, so
their oracles are literal expected-value tables pinned from a verified
run — the same pattern as the sys_columns catalog oracle.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_dtw" \
      # (SPARK_GRAFT_ONLY=sf_dtw,sf_dtw_path to scope it)
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
    assert dtw and path, "empty verify output"

    dtw_rows = ",\n".join(f"            ({uid}, {v!r})" for uid, v in dtw)
    path_rows = ",\n".join(f"            ({uid}, {n}, '{h}')"
                           for uid, n, h in path)
    body = f'''package graft

/** Literal expected-value oracles for the deterministic queries DuckDB
  * cannot compute itself (no DTW builtin). Regenerate with
  * `tools/gen_dtw_oracle.py` after any intentional change to the dtw
  * lowering; a mismatch otherwise IS the regression signal.
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
}}
'''
    body = body.replace("_ROWS_)", ")")
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {os.path.normpath(OUT)}: {len(dtw)} dtw rows, "
          f"{len(path)} path rows")


if __name__ == "__main__":
    main(sys.argv[1])
