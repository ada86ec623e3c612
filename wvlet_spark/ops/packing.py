"""Sequence packing for training pipelines.

Language-model training wants fixed-length token sequences; feeding one
short document per sequence wastes most of the context window.  The
standard fix is concat-and-chunk packing: concatenate documents in a
deterministic order and split the token stream into `capacity`-sized
bins.  This operator assigns each document its (shard, bin, offset)
placement WITHOUT materializing the concatenation — a running token
cumsum does it.

Scale shape: a single global ordering would funnel everything through one
window partition, so documents are first sharded by `doc_id % n_shards`
(engine-portable, deterministic) and packed independently per shard —
each shard is one window partition, n_shards of them in parallel, which
is exactly how a 100 TB corpus is packed in practice (per output file).
Everything is window/aggregate SQL: the DuckDB oracle runs the identical
algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(df: DataFrame, capacity: int = 512, n_shards: int = 8,
                   text_col: str = "text", id_col: str = "doc_id",
                   token_col: str | None = None) -> DataFrame:
    """-> (id, shard, n_tokens, bin_id, bin_offset): the placement of each
    document in the packed token stream of its shard.  Documents may span
    bins (concat-and-chunk semantics); `bin_id` is where the document
    STARTS, `bin_offset` the position inside that bin."""
    if token_col is None:
        toks = F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    else:
        toks = F.col(token_col)
    shard = (F.col(id_col) % n_shards).cast("int")
    base = df.select(F.col(id_col), shard.alias("shard"),
                     toks.alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_tok")
    return (base.select(id_col, "shard", "n_tokens", start)
            .select(
                id_col, "shard", "n_tokens",
                F.floor(F.col("start_tok") / capacity).cast("long")
                .alias("bin_id"),
                (F.col("start_tok") % capacity).cast("long")
                .alias("bin_offset"),
            ))
