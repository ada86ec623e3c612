"""Multimodal columns: opaque binary payloads + typed metadata, decode /
feature-extract as Arrow-batched Pandas UDFs over mapInPandas.

Decode is REAL for PNG and WAV — pure-Python codecs in ops/codecs.py
(zlib inflate + scanline-filter reconstruction for PNG pixels, RIFF walk +
PCM16 frames for WAV); payloads with any other magic fall back to a
deterministic byte-histogram feature so the pipeline never dies on an
unknown format (format tag 'opaque/bytes' marks those rows).

At scale: payloads stay as parquet binary columns; decode runs Arrow-batched
per partition (mapInPandas — one Python worker pass per partition, no
per-row overhead); features come back as fixed-width arrays.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, LongType, StringType,
    StructField, StructType,
)

from wvlet_spark.ops.codecs import (
    PNG_SIG, png_decode, png_encode, wav_decode, wav_encode,
)


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
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("channels", LongType()),
    StructField("bit_depth", LongType()),
    StructField("px_mean", DoubleType()),
    StructField("features", ArrayType(FloatType())),
])


def _decode_payload(payload: bytes) -> dict:
    """Decode one payload by magic bytes: real PNG pixel decode, else a
    normalized byte-histogram fallback ('opaque/bytes')."""
    if payload is None:
        return {"format": "null", "width": None, "height": None,
                "channels": None, "bit_depth": None, "px_mean": None,
                "features": [0.0] * _FEATURE_DIM}
    if payload.startswith(PNG_SIG):
        px, meta = png_decode(payload)
        m = float(px.mean())
        return {
            "format": "image/png",
            "width": meta["width"], "height": meta["height"],
            "channels": meta["channels"], "bit_depth": meta["bit_depth"],
            "px_mean": m,
            "features": [m / 255.0, float(px.std()) / 255.0,
                         float(px.min()) / 255.0, float(px.max()) / 255.0,
                         float(meta["width"]), float(meta["height"]),
                         float(meta["channels"]), float(meta["bit_depth"])],
        }
    # unknown magic: normalized byte-histogram over _FEATURE_DIM buckets
    # (vectorized bincount — identical integer counts to the former
    # per-byte Python loop, round 9)
    arr = np.frombuffer(payload, dtype=np.uint8)
    counts = np.bincount(arr % _FEATURE_DIM, minlength=_FEATURE_DIM)
    total = max(1, len(payload))
    return {"format": "opaque/bytes", "width": None, "height": None,
            "channels": None, "bit_depth": None, "px_mean": None,
            "features": (counts / total).tolist()}


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload) partitions.
    Output: one row per input with media metadata + fixed-width features."""
    from wvlet_spark.ops.util import ensure_map_parallelism
    df = ensure_map_parallelism(df)

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [_decode_payload(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [0 if p is None else len(p) for p in pdf[payload_col]],
                    "format": [r["format"] for r in rows],
                    "width": [r["width"] for r in rows],
                    "height": [r["height"] for r in rows],
                    "channels": [r["channels"] for r in rows],
                    "bit_depth": [r["bit_depth"] for r in rows],
                    "px_mean": [r["px_mean"] for r in rows],
                    "features": [r["features"] for r in rows],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode_batches, _DECODE_SCHEMA)


_AUDIO_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("format", StringType()),
    StructField("channels", LongType()),
    StructField("sample_rate", LongType()),
    StructField("n_samples", LongType()),
    StructField("amp_mean", DoubleType()),
    StructField("amp_rms", DoubleType()),
])


def decode_audio_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched WAV decode: RIFF walk + PCM16 frames -> per-clip stats."""
    from wvlet_spark.ops.util import ensure_map_parallelism
    df = ensure_map_parallelism(df)

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_bytes", "format", "channels",
                                   "sample_rate", "n_samples", "amp_mean", "amp_rms")}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(did)
                out["n_bytes"].append(0 if payload is None else len(payload))
                try:
                    a, meta = wav_decode(payload)
                    samples = a.astype(np.float64)
                    out["format"].append("audio/wav")
                    out["channels"].append(meta["channels"])
                    out["sample_rate"].append(meta["sample_rate"])
                    out["n_samples"].append(meta["n_samples"])
                    out["amp_mean"].append(float(samples.mean()) if samples.size else 0.0)
                    out["amp_rms"].append(float(np.sqrt((samples ** 2).mean())) if samples.size else 0.0)
                except ValueError:
                    out["format"].append("opaque/bytes")
                    for k in ("channels", "sample_rate", "n_samples", "amp_mean", "amp_rms"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(decode_batches, _AUDIO_SCHEMA)


def with_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic PNG per row: constant-valued greyscale image
    with width = id%16+1, height = id%8+1, pixel value = id%256.  The
    round trip (encode -> decode) is then independently checkable by an
    oracle that predicts the metadata/mean from the id alone."""

    @F.pandas_udf(BinaryType())
    def mk(ids: pd.Series) -> pd.Series:
        out = []
        for did in ids:
            i = int(did)
            out.append(png_encode(np.full((i % 8 + 1, i % 16 + 1), i % 256, dtype=np.uint8)))
        return pd.Series(out)

    return df.withColumn("payload", mk(F.col(id_col)))


def with_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic WAV per row: constant PCM16 samples with
    channels = 1 + id%2, rate = 8000 + (id%3)*4000, frames = 64 + id%32,
    value = (id%2000) - 1000."""

    @F.pandas_udf(BinaryType())
    def mk(ids: pd.Series) -> pd.Series:
        out = []
        for did in ids:
            i = int(did)
            ch = 1 + i % 2
            samples = np.full((64 + i % 32, ch), (i % 2000) - 1000, dtype=np.int16)
            out.append(wav_encode(samples, 8000 + (i % 3) * 4000))
        return pd.Series(out)

    return df.withColumn("payload", mk(F.col(id_col)))


_RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
])


def resize_images(df: DataFrame, target_w: int, target_h: int,
                  payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """Nearest-neighbor image resize over Arrow batches: real PNG decode
    (zlib inflate + filter reconstruction), index-sampled numpy resize,
    real PNG re-encode.  Non-PNG payloads pass through as null (same
    magic-byte dispatch as decode_image_features).  Map-only — at 100 TB
    this is a pure scan-transform stage with no shuffle; output rows
    carry the re-encoded payload so downstream stages stream it."""
    from wvlet_spark.ops.util import ensure_map_parallelism
    df = ensure_map_parallelism(df)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, pays, ws_, hs = [], [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(did)
                data = bytes(p) if p is not None else None
                if data is not None and data.startswith(PNG_SIG):
                    px, _meta = png_decode(data)
                    yi = np.arange(target_h) * px.shape[0] // target_h
                    xi = np.arange(target_w) * px.shape[1] // target_w
                    pays.append(png_encode(px[yi][:, xi].astype(np.uint8)))
                    ws_.append(target_w)
                    hs.append(target_h)
                else:
                    pays.append(None)
                    ws_.append(None)
                    hs.append(None)
            yield pd.DataFrame({"doc_id": ids, "payload": pays,
                                "width": ws_, "height": hs})

    return df.select(id_col, payload_col).mapInPandas(batches,
                                                      _RESIZE_SCHEMA)


def with_video_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake video payload per id: (1000 + id % 977) bytes,
    every byte = id % 251.  Stands in for a real container (mp4/webm)
    the same way with_png_payload/with_wav_payload do for image/audio —
    every derived quantity (length, byte values, frame slices) is a pure
    function of the id, so a DuckDB oracle can predict the whole
    frame-sampling output."""
    import pandas as pd

    @F.pandas_udf(BinaryType())
    def mk(ids: pd.Series) -> pd.Series:
        return pd.Series([
            bytes([int(i) % 251]) * (1000 + int(i) % 977) for i in ids])

    return df.withColumn("payload", mk(F.col(id_col)))


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
