#!/usr/bin/env python
"""Generate sf1-scale benchmark data by replicating /root/testdata/sf0.1 10x.

The driver ships sf{0.001,0.01,0.1}; BASELINE.md warns that sub-second
sf0.1 timings are job-overhead-dominated, so the honest same-scale bench
anchor is sf1 (~6M lineitem rows).  This script makes that reproducible:

- Fact/dim tables are replicated with SHIFTED KEYS so referential
  integrity holds per replica (orders.o_custkey moves with customer
  .c_custkey, lineitem moves with orders/part/supplier) — join/agg
  selectivities match the source data instead of fanning out.
- region/nation stay fixed (real dimensions don't grow with volume).
- documents are WORD-PERMUTED per replica (seeded) — byte-identical
  copies would give exact-dedup a free ride and near-dup ops a
  pathological clique; permuted copies preserve realistic shingle overlap.
- embeddings get small deterministic noise per replica for the same
  reason (exact duplicate vectors make every cosine pair 1.0).

Pure DuckDB + numpy/pyarrow: runs in seconds, writes standard
micros-precision parquet with BOUNDED ROW GROUPS (128k/64k rows): row
groups are the real scan-split unit, and a single-row-group file makes
every byte-range split but one EMPTY — a '32-partition' scan that
actually runs serial (round-5 minhash postmortem).  Usage:

    python tools/gen_sf1.py [--out /tmp/wv/sf1] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os
import random

SRC = "/root/testdata/sf0.1"

# key columns to shift per replica: table -> {column: stride-source table}
# stride = max(key)+1 of the stride-source table, so replica r's keys are
# key + r*stride and cross-table references stay aligned.
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
}

KEY_OF = {
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "events": "event_id",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/wv/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--tables", default=None,
                    help="comma list to generate only some tables "
                         "(e.g. documents,embeddings for a doc-ops "
                         "scale corpus without the 17 GB TPC-H side)")
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None

    def wanted(t: str) -> bool:
        return only is None or t in only
    os.makedirs(args.out, exist_ok=True)

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    con = duckdb.connect()
    strides: dict[str, int] = {}
    for t, k in KEY_OF.items():
        strides[t] = con.execute(
            f"SELECT max({k})+1 FROM '{SRC}/{t}.parquet'").fetchone()[0]
    strides["events_user"] = con.execute(
        f"SELECT max(user_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]

    # fixed dimensions
    for t in ("region", "nation"):
        if not wanted(t):
            continue
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{args.out}/{t}.parquet' (FORMAT parquet, ROW_GROUP_SIZE 131072)")

    # key-shifted replicas, one COPY per table (replica id from range())
    for t, shifts in SHIFTS.items():
        if not wanted(t):
            continue
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + r.range * {strides[shifts[c]]} AS {c}" if c in shifts
            else c for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"range({args.replicas}) r) "
            f"TO '{args.out}/{t}.parquet' (FORMAT parquet, ROW_GROUP_SIZE 131072)")

    # documents: word-permute per replica (replica 0 verbatim).  STREAMED
    # one replica at a time through a ParquetWriter — at --replicas 1000
    # (sf100) the old accumulate-everything dict held ~5 GB of Python
    # strings before the single write.
    rows = [] if not wanted("documents") else con.execute(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM '{SRC}/documents.parquet' ORDER BY doc_id").fetchall()
    stride_d = max((r[0] for r in rows), default=0) + 1
    dwriter = None
    for rep in range(args.replicas if rows else 0):
        out = {"doc_id": [], "text": [], "lang": [], "source": [],
               "n_chars": []}
        for doc_id, text, lang, source, n_chars in rows:
            if rep > 0:
                words = text.split(" ")
                random.Random(rep * 1_000_003 + doc_id).shuffle(words)
                text = " ".join(words)
            out["doc_id"].append(doc_id + rep * stride_d)
            out["text"].append(text)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(text))
        tbl = pa.table(out)
        if dwriter is None:
            dwriter = pq.ParquetWriter(f"{args.out}/documents.parquet",
                                       tbl.schema)
        dwriter.write_table(tbl, row_group_size=65536)
    if dwriter is not None:
        dwriter.close()

    # embeddings: deterministic per-replica noise
    vecs = [] if not wanted("embeddings") else con.execute(
        f"SELECT vec_id, embedding, label "
        f"FROM '{SRC}/embeddings.parquet' ORDER BY vec_id").fetchall()
    stride_v = max((r[0] for r in vecs), default=0) + 1
    dim = len(vecs[0][1]) if vecs else 0
    vwriter = None
    for rep in range(args.replicas if vecs else 0):
        rng = np.random.RandomState(rep)
        ids, embs, labels = [], [], []
        for vec_id, emb, label in vecs:
            v = np.asarray(emb, dtype=np.float32)
            if rep > 0:
                v = v + rng.standard_normal(dim).astype(np.float32) * 0.02
            ids.append(vec_id + rep * stride_v)
            embs.append(v.tolist())
            labels.append(label)
        tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                        "embedding": pa.array(embs, pa.list_(pa.float32())),
                        "label": pa.array(labels, pa.int32())})
        if vwriter is None:
            vwriter = pq.ParquetWriter(f"{args.out}/embeddings.parquet",
                                       tbl.schema)
        vwriter.write_table(tbl, row_group_size=65536)
    if vwriter is not None:
        vwriter.close()

    for f in sorted(os.listdir(args.out)):
        n = con.execute(
            f"SELECT count(*) FROM '{args.out}/{f}'").fetchone()[0]
        print(f"{f[:-8]}: {n} rows")


if __name__ == "__main__":
    main()
