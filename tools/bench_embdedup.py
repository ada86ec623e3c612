"""2M-vector scale measurement for semantic_dedup and
embedding_near_dup_pairs (round-6 verdict ask #5; SCALE.md §31).

§29 declined both measurements on the replicated bench corpus: the
1000-replica embeddings plant ~999 near-dups of EVERY vector, so any
correct near-dup pass returns ~1e9 pairs and a timing measures the
output cap, not the operator.  This harness builds a REALISTIC corpus —
unique gaussian vectors with a small planted near-dup fraction — and
measures:

  (a) semantic_dedup with n_clusters scaled to the corpus
      (k = n/1000, the SemDeDup paper's regime) using the round-7
      `grouped` pair strategy (per-cluster blocked matmul, one shuffle
      of the corpus);
  (b) embedding_near_dup_pairs(use_lsh=True) — hyperplane buckets sized
      so expected bucket occupancy stays O(10).

Both print one JSON line with wall time, output sizes, and recall of
the planted pairs (the honesty check: a fast pass that misses the
plants measures nothing).

Usage: python tools/bench_embdedup.py [--n 2000000] [--dup-frac 0.02]
       [--out /tmp/wv/emb2m]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DIM = 64


def gen_corpus(out_dir: str, n: int, dup_frac: float, seed: int = 7) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_dup = int(n * dup_frac)
    n_base = n - n_dup
    writer = None
    chunk = 200_000
    # base vectors streamed in chunks; dups are noisy copies of random
    # base ids from the FIRST chunk (known ids -> recall is checkable)
    first = rng.standard_normal((min(chunk, n_base), DIM))
    dup_src = rng.integers(0, len(first), size=n_dup)
    planted = []  # (src_id, dup_id)
    next_id = 0

    def write(ids, mat):
        nonlocal writer
        t = pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([row for row in mat.astype(np.float32)],
                                  type=pa.list_(pa.float32())),
        })
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t, row_group_size=65536)

    write(range(0, len(first)), first)
    next_id = len(first)
    done = len(first)
    while done < n_base:
        m = min(chunk, n_base - done)
        write(range(next_id, next_id + m), rng.standard_normal((m, DIM)))
        next_id += m
        done += m
    # planted near-dups: tiny noise, cosine >> 0.95
    src = first[dup_src]
    dups = src + 0.01 * rng.standard_normal(src.shape)
    write(range(next_id, next_id + n_dup), dups)
    planted = [(int(s), next_id + i) for i, s in enumerate(dup_src)]
    writer.close()
    import pickle
    with open(os.path.join(out_dir, "planted.pkl"), "wb") as f:
        pickle.dump(planted, f)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--dup-frac", type=float, default=0.02)
    ap.add_argument("--out", default="/tmp/wv/emb2m")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--which", default="both",
                    choices=["both", "semdedup", "lsh"])
    args = ap.parse_args()

    path = gen_corpus(args.out, args.n, args.dup_frac)
    import pickle
    with open(os.path.join(args.out, "planted.pkl"), "rb") as f:
        planted = pickle.load(f)
    planted_set = {(min(a, b), max(a, b)) for a, b in planted}

    import bench
    from pyspark.sql import functions as F
    from wvlet_spark.session import read_parquet_robust

    spark = bench._make_spark(args.out, args.cpus)
    emb = read_parquet_robust(spark, path)

    if args.which in ("both", "semdedup"):
        from wvlet_spark.ops.similarity import semantic_dedup
        k = max(16, args.n // 1000)
        t0 = time.perf_counter()
        out = semantic_dedup(emb, n_clusters=k, threshold=0.95,
                             pair_strategy="grouped")
        n_dropped = out.filter(~F.col("keep")).count()
        dt = time.perf_counter() - t0
        # recall: planted dup ids (higher id of each pair) flagged not-keep
        dup_ids = [b for (_a, b) in planted_set]
        flagged = (out.filter(~F.col("keep"))
                   .filter(F.col("vec_id").isin(dup_ids[:5000]))
                   .count())
        print(json.dumps({
            "op": "semantic_dedup_grouped", "n": args.n, "k": k,
            "wall_s": round(dt, 1), "dropped": n_dropped,
            "planted_recall_sample": round(flagged / 5000, 4)}))

    if args.which in ("both", "lsh"):
        from wvlet_spark.ops.similarity import embedding_near_dup_pairs
        t0 = time.perf_counter()
        pairs = embedding_near_dup_pairs(emb, threshold=0.95, use_lsh=True,
                                         planes=16)
        n_pairs = pairs.count()
        dt = time.perf_counter() - t0
        got = {(r.id_a, r.id_b) for r in pairs.limit(2_000_000).collect()}
        sample = list(planted_set)[:5000]
        rec = sum((p in got) for p in sample) / len(sample)
        print(json.dumps({
            "op": "embedding_near_dup_lsh", "n": args.n, "planes": 16,
            "wall_s": round(dt, 1), "pairs": n_pairs,
            "planted_recall_sample": round(rec, 4)}))


if __name__ == "__main__":
    main()
