"""Multimodal column operators (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata alongside. The Spark-side plumbing here — schemas, Arrow
batch shape, ``mapInPandas`` signatures, partition sizing — is real
and tested; codec work goes through ``decoder=`` hooks. Four decoders
ship: the stdlib from-spec PNG path
(``functions.png.png_feature_decoder`` — a REAL image decode, tested
end-to-end through mapInPandas), the stdlib from-spec WAV/PCM path
(``functions.wav.wav_feature_decoder`` — a REAL audio decode, same
test treatment), the deterministic md5 fake (``fake_decoder``, used by
the hash-pinned oracle query), and the raising ``default_decoder``
placeholder for formats that need external libraries (JPEG/video — not
in this container; pass a PIL/ffmpeg-backed callable in production).

Scale notes:
- Binary payloads never pass through Python row-at-a-time: mapInPandas
  streams Arrow record batches, and ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` bounds executor memory per batch (set it low —
  e.g. 64 — for multi-MB payload columns).
- Feature extraction keeps the payload column out of its output
  (column pruning: downstream stages never reload the bytes).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed media-asset schema: payload + metadata columns.
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", DoubleType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def default_decoder(payload: bytes) -> np.ndarray:
    """Placeholder for a real image/audio decode. Not available here."""
    raise NotImplementedError(
        "No media codec in this environment — pass decoder=fake_decoder "
        "(deterministic) or a real PIL/ffmpeg-backed callable."
    )


def fake_decoder(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in decode: md5-derived pseudo-features.

    Same bytes → same features on every executor; lets the pipeline
    shape (schemas, batching, joins) be exercised end-to-end without
    codec libraries.
    """
    import hashlib

    digest = hashlib.md5(payload or b"").digest()
    return np.frombuffer(digest[: dim], dtype=np.uint8).astype(np.float64) / 255.0


def documents_as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapt the documents table into MEDIA_SCHEMA (payload = utf-8 bytes).

    The testdata has no real image column; encoding text as the binary
    payload exercises the identical plumbing (binary column, metadata,
    Arrow batches).
    """
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("double").alias("duration_ms"),
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = default_decoder,
) -> DataFrame:
    """Decode payloads and emit fixed-width feature vectors.

    mapInPandas over Arrow batches; the payload column is dropped from
    the output so downstream plans never carry the bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if p is None else decoder(bytes(p)).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    src = media.select("asset_id", "payload")
    return src.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: float = 1000.0, max_frames: int = 16
) -> DataFrame:
    """Plan video frame sampling: one output row per (asset, frame_ts).

    The *sampling schedule* is pure SQL (sequence over duration), so
    the expensive decode fan-out is declared before any codec runs —
    Catalyst sees the real row multiplier. Decode of each frame then
    goes through :func:`extract_features`-style mapInPandas.
    """
    n_frames = F.least(
        F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
        .drop("payload")
    )


def resize_plan(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Attach resize metadata (aspect-preserving fit) — pure SQL.

    The scale factors are computed declaratively; the pixel work would
    happen in the decoder hook.
    """
    scale = F.least(target_w / F.col("width"), target_h / F.col("height"))
    return media.withColumn("resize_scale", F.round(scale, 6)).withColumn(
        "resized_w", (F.col("width") * scale).cast("int")
    ).withColumn("resized_h", (F.col("height") * scale).cast("int"))
