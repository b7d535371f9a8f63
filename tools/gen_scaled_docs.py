#!/usr/bin/env python3
"""Derive a scaled documents corpus from a base scale factor, the same
construction PERFNOTES r17 used for /tmp/sf1 (which was built ad-hoc and
not preserved — this tool pins the recipe):

  N copies of the base corpus; doc_ids offset by copy * base_count;
  every 3rd word STARTING AT WORD 0 of each copy c >= 1 gets a per-copy
  suffix "~c", so EVERY 3-shingle of a copied document contains a
  modified word and the cross-copy 3-shingle Jaccard is ~0 — copies add
  corpus mass without adding cross-copy near-dup pairs, while the
  WITHIN-copy near-dup structure (the planted pairs) is preserved
  (both members of a pair get the same positional suffixes).

  Why the stride matters (r21 measurement): r17's ad-hoc sf1 script
  modified every 7th word starting at 6, which (a) left <=6-word docs
  IDENTICAL across copies (N-member LSH buckets, N^2 true-pair
  output), and (b) left cross-copy Jaccard at ~0.4 — squarely inside
  the (32,16)-LSH recall zone (band width 2: ~94% candidate
  probability per pair), so candidate volume grew ~N^2/2 with copy
  count: 1,921 candidates at sf0.1 -> 303,975 at 10 copies -> ~23M at
  100 copies, and dedup_minhash_lsh read 387 s at sf10 measuring the
  CORPUS artifact, not the engine. With stride 3 the candidate volume
  scales with the real near-dup density instead.

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
        for i in range(0, len(w), 3):
            w[i] = w[i] + tag
        out.append(" ".join(w))
    return out


def main():
    base_path, out_path, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    base = pq.read_table(base_path)
    n = base.num_rows
    ids = base.column("doc_id").to_pylist()
    # copy offset must clear the base ID RANGE, not the row count:
    # offsetting by num_rows silently merges distinct documents across
    # copies whenever base doc_ids are not dense in [0, n)
    stride = max(ids) + 1
    assert min(ids) >= 0, "negative base doc_ids break the copy offset"
    texts = base.column("text").to_pylist()
    lang = base.column("lang")
    source = base.column("source")
    schema = base.schema
    writer = pq.ParquetWriter(out_path, schema)
    for c in range(copies):
        t2 = suffix_copy(texts, c)
        batch = pa.table(
            {
                "doc_id": pa.array([i + c * stride for i in ids],
                                   pa.int64()),
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
