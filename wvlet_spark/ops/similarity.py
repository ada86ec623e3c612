"""Embedding similarity search.

- brute_force_topk: exact cosine top-k. One scan, map-side cosine in JVM
  expressions, TakeOrdered reduce — no shuffle of the corpus. The correct
  baseline at any scale; at 100 TB it is scan-bound.
- rp_lsh_buckets / lsh_bucket_topk: random-hyperplane LSH. Bucket signature
  is computed map-only; a query probes its own bucket (+ multi-probe flips)
  so the candidate set is corpus/2^planes on average. The scale path when
  the corpus no longer fits a full scan per query.

Vectors are array<float> columns; dot products run as F.aggregate/zip_with
(whole-stage codegen, no Python).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(col, vec: list[float]):
    lit = F.array(*[F.lit(float(x)) for x in vec])
    return F.aggregate(
        F.zip_with(col, lit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(col):
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_col(col, vec: list[float]):
    qn = float(np.sqrt(np.dot(vec, vec)))
    return _dot(col, vec) / (_norm(col) * F.lit(qn))


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k against a query vector."""
    sim = cosine_col(F.col(vec_col), query_vec)
    return (
        df.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.4,
                             vec_col: str = "embedding", id_col: str = "vec_id",
                             use_lsh: bool = False, planes: int = 8,
                             seed: int = 42) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    id_a < id_b and cosine >= threshold.

    use_lsh=False (exact baseline): self-join on id inequality — O(n²)
    dot products, all JVM-side.  Right answer, only viable when one side
    broadcasts.
    use_lsh=True (scale path): random-hyperplane bucket equi-join first, so
    only same-bucket pairs pay a dot product — recall depends on `planes`
    (fewer planes = bigger buckets = higher recall, more compute).
    """
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    if use_lsh:
        dim = len(df.select(vec_col).first()[0])
        v = rp_lsh_buckets(v, dim, planes, seed, "__v").withColumnRenamed("lsh_bucket", "__b")
        join_on = [F.col("l.__b") == F.col("r.__b"),
                   F.col(f"l.{id_col}") < F.col(f"r.{id_col}")]
    else:
        join_on = [F.col(f"l.{id_col}") < F.col(f"r.{id_col}")]
    l, r_ = v.alias("l"), v.alias("r")
    pairs = l.join(r_, on=join_on)
    dot = F.aggregate(
        F.zip_with(F.col("l.__v"), F.col("r.__v"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    cos = dot / (_norm(F.col("l.__v")) * _norm(F.col("r.__v")))
    return (
        pairs.select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(cos, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((planes, dim))


def rp_lsh_buckets(df: DataFrame, dim: int, planes: int = 12, seed: int = 42,
                   vec_col: str = "embedding") -> DataFrame:
    """Append an integer LSH bucket: sign bits of `planes` random-hyperplane
    projections. Map-only; deterministic via seed."""
    H = _hyperplanes(dim, planes, seed)
    bucket = F.lit(0).cast("long")
    for i in range(planes):
        bit = F.when(_dot(F.col(vec_col), H[i].tolist()) >= 0,
                     F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return df.withColumn("lsh_bucket", bucket)


def lsh_bucket_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                    planes: int = 12, multiprobe: int = 1, seed: int = 42,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: probe the query's bucket plus all buckets within
    `multiprobe` bit flips, exact cosine inside the candidate set.

    At scale the bucketed table is precomputed+partitioned by bucket, making
    this a partition-pruned scan instead of a full pass."""
    dim = len(query_vec)
    H = _hyperplanes(dim, planes, seed)
    qb = 0
    proj = H @ np.asarray(query_vec)
    for i in range(planes):
        if proj[i] >= 0:
            qb |= 1 << i
    probes = {qb}
    if multiprobe >= 1:
        # flip the planes with smallest |projection| first (most uncertain)
        order = np.argsort(np.abs(proj))
        for i in order[: max(multiprobe * 3, 3)]:
            probes.add(qb ^ (1 << int(i)))
    bucketed = rp_lsh_buckets(df, dim, planes, seed, vec_col)
    cand = bucketed.filter(F.col("lsh_bucket").isin([int(b) for b in probes]))
    sim = cosine_col(F.col(vec_col), query_vec)
    return (
        cand.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
