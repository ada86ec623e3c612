"""Shared helpers for the extension operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

# (session id, semantic plan hash) -> scan partition count.  The probe that
# fills this (plan -> RDD conversion) costs a driver round-trip + physical
# planning, so it runs at most once per distinct plan per session; repeated
# ext-op invocations hit the cache via semanticHash (one cheap JVM call on
# the already-analyzed plan, no physical planning).
_NPARTS_CACHE: dict[tuple[int, int], int] = {}


def ensure_map_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition iff the input has fewer partitions than
    ``min_fraction * defaultParallelism``.

    CPU-heavy map stages (signature UDFs, regex scoring, decode) are bounded
    by input splits; a small table written as one parquet row-group scans as
    ONE task no matter how many cores exist, so the map runs 1-wide.  The
    guard only triggers on under-split inputs: at cluster scale a 100 TB
    input already has thousands of splits and this is a no-op — we never add
    a shuffle in front of well-partitioned data.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        key = (id(df.sparkSession), df.semanticHash())
        nparts = _NPARTS_CACHE.get(key)
        if nparts is None:
            nparts = df.rdd.getNumPartitions()
            _NPARTS_CACHE[key] = nparts
    except Exception:
        return df
    if nparts < max(1, int(target * min_fraction)):
        return df.repartition(target)
    return df
