#!/usr/bin/env python3
"""Generate the pinned crc32/sha1 VALUES block for dialect_scalar_hash.

DuckDB has md5/sha256 but no crc32/sha1, so those two columns are pinned
from the deterministic sf0.01 customer names (c_custkey <= 20). Re-run if
the driver regenerates testdata, paste into PinnedOracles.scalarHash.

Usage: python3 tools/gen_hash_oracle.py [sf_dir]
"""
import hashlib
import sys
import zlib

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
rows = con.sql(
    f"SELECT c_custkey, c_name FROM '{sf}/customer.parquet' "
    "WHERE c_custkey <= 20 ORDER BY c_custkey").fetchall()
print("    (VALUES")
vals = []
for k, name in rows:
    b = name.encode()
    vals.append(f"      ({k}, {zlib.crc32(b)}, "
                f"'{hashlib.sha1(b).hexdigest()}')")
print(",\n".join(vals))
print("    ) AS pin(c_custkey, crc, s1)")
