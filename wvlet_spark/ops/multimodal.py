"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract as Arrow-batched Pandas UDFs over mapInPandas.

The container has no image/audio libraries, so the actual pixel/sample
decode is STUBBED behind `_decode_payload` (deterministic fake) — the
Spark-side plumbing (schema, batching, partition flow) is real and tested.
At scale: payloads stay as parquet binary columns; decode runs Arrow-batched
per partition; features come back as fixed-width arrays.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField, StructType,
)

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload column + media metadata struct —
    stands in for real image/audio bytes in the testdata."""
    payload = F.encode(F.col(text_col), "utf-8").cast(BinaryType())
    meta = F.struct(
        (F.abs(F.xxhash64(F.col(id_col))) % 1920 + 16).alias("width"),
        (F.abs(F.xxhash64(F.col(id_col), F.lit(1))) % 1080 + 16).alias("height"),
        F.lit("fake/rgb8").alias("format"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


_FEATURE_DIM = 8

_DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("format", StringType()),
    StructField("features", ArrayType(FloatType())),
])


def _decode_payload(payload: bytes) -> list[float]:
    """Deterministic fake 'decode + feature extract'.

    Real implementation would decode pixels (PIL/libvips) and pool features;
    raise if someone expects real decoding without the libs installed.
    """
    if HAVE_PIL:  # pragma: no cover
        raise NotImplementedError("real image decode path not implemented in this container")
    if payload is None:
        return [0.0] * _FEATURE_DIM
    # byte-histogram over _FEATURE_DIM buckets, normalized
    counts = [0] * _FEATURE_DIM
    for b in payload:
        counts[b % _FEATURE_DIM] += 1
    total = max(1, len(payload))
    return [c / total for c in counts]


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload) partitions.
    Output: one row per input with fixed-width feature vector."""
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [_decode_payload(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [0 if p is None else len(p) for p in pdf[payload_col]],
                    "format": ["fake/rgb8"] * len(pdf),
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode_batches, _DECODE_SCHEMA)


_FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("offset_ms", LongType()),
    StructField("frame_payload", BinaryType()),
])


def sample_video_frames(df: DataFrame, n_frames: int = 4,
                        payload_col: str = "payload",
                        id_col: str = "doc_id") -> DataFrame:
    """Frame sampling plumbing: one input row fans out to n_frames rows of
    (frame_idx, offset_ms, frame_payload) via Arrow-batched mapInPandas —
    the row-explosion shape a real video pipeline needs (partition sizing
    must account for the xN output amplification).

    Decode is STUBBED: frame payloads are deterministic byte slices of the
    input (a real impl would demux with pyav/ffmpeg); offsets pretend a
    30fps/10s clip sampled uniformly."""
    import pandas as pd

    def frame_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "offset_ms": [], "frame_payload": []}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                data = payload or b""
                step = max(1, len(data) // max(1, n_frames))
                for i in range(n_frames):
                    out["doc_id"].append(did)
                    out["frame_idx"].append(i)
                    out["offset_ms"].append(i * (10_000 // max(1, n_frames)))
                    out["frame_payload"].append(bytes(data[i * step:(i + 1) * step]))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(frame_batches, _FRAME_SCHEMA)
