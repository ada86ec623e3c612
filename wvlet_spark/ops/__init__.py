"""Native PySpark extension operators — the LLM-data-pipeline layer.

These go beyond the reference's own operator surface (BASELINE.json
north-star): deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard), embedding similarity search, text analysis, and multimodal
column plumbing — each designed for 100 TB scale: everything stays in
DataFrame expressions (JVM/codegen) or Arrow-batched Pandas UDFs; no
driver-side loops, LSH banding instead of O(n^2) pair joins.
"""

from wvlet_spark.ops.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from wvlet_spark.ops.similarity import brute_force_topk, lsh_bucket_topk, rp_lsh_buckets
from wvlet_spark.ops.text import (
    document_fingerprint,
    language_id,
    quality_score,
    token_stats,
)
from wvlet_spark.ops.multimodal import decode_image_features, with_binary_payload
from wvlet_spark.ops.registry import entry_oracles, entry_queries

__all__ = [
    "exact_dedup", "minhash_signatures", "minhash_near_dup_pairs",
    "simhash", "simhash_near_dup_pairs", "ngram_jaccard_pairs",
    "brute_force_topk", "rp_lsh_buckets", "lsh_bucket_topk",
    "language_id", "quality_score", "token_stats", "document_fingerprint",
    "with_binary_payload", "decode_image_features",
    "entry_queries", "entry_oracles",
]
