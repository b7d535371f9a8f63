#!/usr/bin/env python3
"""Derive a scaled documents corpus from a base scale factor, the same
construction PERFNOTES r17 used for /tmp/sf1 (which was built ad-hoc and
not preserved — this tool pins the recipe):

  N copies of the base corpus; doc_ids offset by copy * base_count;
  every 7th word of each copy c >= 1 gets a per-copy suffix "~c" so the
  copies are NOT near-duplicates of each other (measured cross-copy
  3-shingle Jaccard ~0.4 at r17, well under the 0.8/0.9 dedup
  thresholds) while token/df structure is preserved.

Output is written with one row group per copy so a Spark scan gets real
split parallelism (the testdata files are single-row-group, which is
exactly what TextOps.fanOut compensates for — the derived corpus should
look like production data instead).

Usage: gen_scaled_docs.py <base_documents.parquet> <out.parquet> <copies>
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def suffix_copy(texts, c):
    if c == 0:
        return texts
    out = []
    tag = f"~{c}"
    for t in texts:
        if t is None:
            out.append(t)
            continue
        w = t.split(" ")
        for i in range(6, len(w), 7):
            w[i] = w[i] + tag
        out.append(" ".join(w))
    return out


def main():
    base_path, out_path, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    base = pq.read_table(base_path)
    n = base.num_rows
    ids = base.column("doc_id").to_pylist()
    texts = base.column("text").to_pylist()
    lang = base.column("lang")
    source = base.column("source")
    schema = base.schema
    writer = pq.ParquetWriter(out_path, schema)
    for c in range(copies):
        t2 = suffix_copy(texts, c)
        batch = pa.table(
            {
                "doc_id": pa.array([i + c * n for i in ids], pa.int64()),
                "text": pa.array(t2, pa.string()),
                "lang": lang,
                "source": source,
                "n_chars": pa.array([len(x) if x is not None else None
                                     for x in t2], pa.int64()),
            },
            schema=schema,
        )
        writer.write_table(batch, row_group_size=n)
    writer.close()
    print(f"wrote {out_path}: {n * copies} rows, {copies} row groups")


if __name__ == "__main__":
    main()
