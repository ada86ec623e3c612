"""Deterministic (reproducible) sampling for training-data pipelines.

`df.sample()` is RNG-seeded per partition: the selected rows change with
partitioning, Spark version, and engine — useless for reproducible
dataset lineage.  These operators decide membership from a HASH OF THE
ROW KEY, so the same row is always in or out of the sample regardless of
engine, partition layout, or run:

    keep(row)  <=>  md5(salt || key)[:8] < hex(fraction * 16^8)

md5 is uniform over hex strings, the comparison is plain lexicographic
string order, and both Spark and DuckDB produce identical lowercase hex —
the driver oracle recomputes membership independently in SQL.  Map-only:
a filter on a computed column, no shuffle, scales linearly.

Stratified variant: per-stratum fractions (e.g. rebalancing languages or
sources to a target mixture) via one small broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SPACE = 16 ** 8  # first 8 hex chars of md5


def _threshold_hex(fraction: float) -> str:
    # The threshold must stay an 8-char string compared lexicographically
    # against an 8-char hex prefix.  fraction>=1.0 would format to
    # '100000000' (9 chars), which only prefixes starting with '0' sort
    # below — use 'g' (sorts above every hex char) so ALL prefixes pass;
    # fraction<=0 keeps nothing via the all-zero threshold.
    n = max(0, min(_SPACE, int(round(fraction * _SPACE))))
    if n >= _SPACE:
        return "g" * 8
    return format(n, "08x")


def _bucket_col(key_col: str, salt: str):
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8)


def deterministic_sample(df: DataFrame, fraction: float,
                         key_col: str = "doc_id",
                         salt: str = "wv") -> DataFrame:
    """Keep ~`fraction` of rows, membership decided by key hash — stable
    across engines, partitionings, and reruns.  Change `salt` to draw an
    independent sample."""
    return df.filter(_bucket_col(key_col, salt) < F.lit(_threshold_hex(fraction)))


def stratified_deterministic_sample(df: DataFrame, fractions: dict[str, float],
                                    strata_col: str, key_col: str = "doc_id",
                                    default_fraction: float = 0.0,
                                    salt: str = "wv") -> DataFrame:
    """Per-stratum deterministic sampling: `fractions` maps stratum value
    -> keep fraction (strata absent from the map keep `default_fraction`).
    The per-row threshold is a literal CASE over the (small) fractions
    map — no join, map-only."""
    thr = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(_threshold_hex(frac))).otherwise(thr)
    return df.filter(_bucket_col(key_col, salt) < thr)


def mixture_sample(df: DataFrame, target_weights: dict[str, float],
                   source_col: str = "source", key_col: str = "doc_id",
                   salt: str = "wv") -> DataFrame:
    """Target-mixture sampling (training-data mixing, Pile-style): given
    target proportions per source, keep the LARGEST deterministic
    subsample whose composition matches them —
        T = min_s(n_s / w_s) total rows, fraction_s = T * w_s / n_s.
    Sources absent from the map are dropped.  Counting is one small
    aggregate (|sources| rows to the driver — bounded by the source
    vocabulary, not the data); membership uses the same engine-portable
    md5 rule as deterministic_sample, so the drawn subsample is
    reproducible across engines/partitionings and a DuckDB oracle can
    re-derive BOTH the fraction computation and the membership."""
    counts = {r[0]: r[1] for r in
              df.groupBy(source_col).count().collect()}
    live = {s: w for s, w in target_weights.items()
            if w > 0 and counts.get(s)}
    if not live:
        return df.filter(F.lit(False))
    t = min(counts[s] / w for s, w in live.items())
    fractions = {s: min(1.0, t * w / counts[s]) for s, w in live.items()}
    return stratified_deterministic_sample(
        df, fractions, source_col, key_col, 0.0, salt)


def epoch_shuffle(df: DataFrame, epoch: int, key_col: str = "doc_id",
                  salt: str = "wv") -> DataFrame:
    """Deterministic global training-order shuffle for one epoch.

    Training pipelines need a REPRODUCIBLE document order per epoch
    (restartable jobs, cross-run comparisons, data-order ablations) that
    still differs between epochs.  RNG-based orderBy(rand(seed)) depends
    on partition layout; this derives the position from an engine-portable
    hash: `order by md5(salt || epoch || ':' || key)` — same order on any
    engine or partitioning, different permutation each epoch, and a DuckDB
    oracle can re-derive it exactly.

    Scale: one range-partitioned global sort (Spark samples the hash
    space to build range bounds) — the same cost as any total ordering;
    at 100 TB assign `shard = substr(hash, 1, 2)` first and sort within
    shards instead (the written shard files are consumed sequentially, so
    within-shard order + shard order = global order without a single
    global sort).  `position` is the rank within the epoch (dense, 1-based)
    for downstream curriculum/resume bookkeeping.
    """
    from pyspark.sql import Window

    from wvlet_spark.ops.util import sort_once

    h = F.md5(F.concat(F.lit(f"{salt}:{int(epoch)}:"),
                       F.col(key_col).cast("string")))
    out = df.withColumn("shuffle_key", h)
    w = Window.orderBy("shuffle_key", F.col(key_col))
    return (out.withColumn("position", F.row_number().over(w))
            .transform(sort_once, "position", checkpoint=False))
