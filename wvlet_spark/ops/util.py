"""Shared helpers for the extension operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if nparts < max(1, int(target * min_fraction)):
        return df.repartition(target)
    return df
