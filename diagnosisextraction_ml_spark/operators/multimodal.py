"""Multimodal column operators (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata alongside. The Spark-side plumbing here — schemas, Arrow
batch shape, ``mapInPandas`` signatures, partition sizing — is real
and tested; codec work goes through ``decoder=`` hooks. Six decoders
ship: the stdlib from-spec PNG path
(``functions.png.png_feature_decoder`` — a REAL image decode, tested
end-to-end through mapInPandas), the stdlib from-spec WAV/PCM path
(``functions.wav.wav_feature_decoder`` — a REAL audio decode, same
test treatment), the stdlib from-spec BMP path
(``functions.bmp.bmp_feature_decoder`` — uncompressed BI_RGB), the
from-spec baseline-JPEG path (``functions.jpeg.jpeg_feature_decoder``
— T.81 Huffman + IDCT + 4:2:0 upsampling, validated against real
libjpeg output), the deterministic md5 fake (``fake_decoder``, used
by the hash-pinned oracle query), and the raising ``default_decoder``
placeholder for formats that need external libraries (video — not in
this container; pass an ffmpeg-backed callable in production).

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


IMAGE_FEATURES_ROBUST_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("decode_error", StringType(), True),
    ]
)

# Magic-byte sniffers for the formats with real from-spec decoders.
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_RIFF_MAGIC = b"RIFF"
_BMP_MAGIC = b"BM"
_JPEG_MAGIC = b"\xff\xd8"


def sniffing_decoder(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes to the real from-spec codecs: PNG →
    functions.png, RIFF/WAVE → functions.wav, BMP → functions.bmp,
    JPEG (baseline/extended-sequential Huffman) → functions.jpeg.
    Anything else (video containers, progressive JPEG, …) raises
    NotImplementedError or ValueError — the remaining external-library
    boundary is VIDEO; in production wrap an ffmpeg callable the same
    way."""
    from diagnosisextraction_ml_spark.functions.bmp import bmp_feature_decoder
    from diagnosisextraction_ml_spark.functions.jpeg import jpeg_feature_decoder
    from diagnosisextraction_ml_spark.functions.png import png_feature_decoder
    from diagnosisextraction_ml_spark.functions.wav import wav_feature_decoder

    if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return png_feature_decoder(payload)
    if payload[:4] == _RIFF_MAGIC and payload[8:12] == b"WAVE":
        return wav_feature_decoder(payload)
    if payload[:2] == _BMP_MAGIC:
        return bmp_feature_decoder(payload)
    if payload[:2] == _JPEG_MAGIC:
        return jpeg_feature_decoder(payload)
    raise NotImplementedError(
        f"no built-in codec for payload starting {payload[:4]!r} — "
        "PNG, WAV/PCM, BMP, and baseline JPEG decode from spec here; "
        "video containers need an external library (pass an "
        "ffmpeg-backed decoder)"
    )


def extract_features_robust(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = sniffing_decoder,
) -> DataFrame:
    """Decode payloads with PER-ROW fault isolation — the mixed-corpus
    serving path. A payload the decoder rejects (unknown format,
    truncated file, codec bug) yields typed NULL features plus a
    ``decode_error`` string instead of failing the stage: on a mixed
    100 TB corpus one stray JPEG must cost one row, not the job.
    Healthy rows carry ``decode_error = NULL``, so the quarantine
    split is one filter each way.

    Same Arrow/mapInPandas shape as :func:`extract_features` (payload
    pruned from the output, batch-bounded memory); the only difference
    is the catch: per-row decode failures become data, anything else
    still raises (a systemic failure should stop the stage loudly).
    The caught set covers every way a corrupt byte stream actually
    surfaces from the from-spec codecs: NotImplementedError (unknown
    format), ValueError / OSError (semantic validation),
    ``struct.error`` (truncation mid-header — a short chunk-length
    field fails the fixed-width unpack), and ``zlib.error``
    (bit-flipped / truncated IDAT deflate payload).
    """
    import struct as _struct
    import zlib as _zlib

    _ROW_FAULTS = (
        NotImplementedError,
        ValueError,
        OSError,
        _struct.error,
        _zlib.error,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list[list[float] | None] = []
            errs: list[str | None] = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    errs.append("null payload")
                    continue
                try:
                    feats.append(decoder(bytes(p)).tolist())
                    errs.append(None)
                except _ROW_FAULTS as e:
                    feats.append(None)
                    errs.append(f"{type(e).__name__}: {e}"[:200])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    src = media.select("asset_id", "payload")
    return src.mapInPandas(run, IMAGE_FEATURES_ROBUST_SCHEMA)


VIDEO_PROBE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("brand", StringType(), True),
        StructField("duration_ms", DoubleType(), True),
        StructField("n_tracks", IntegerType(), True),
        StructField("handler0", StringType(), True),
        StructField("codec0", StringType(), True),
        StructField("probe_error", StringType(), True),
    ]
)


def probe_video_metadata(media: DataFrame) -> DataFrame:
    """Container-level video metadata, distributed — the routing pass
    a training pipeline runs BEFORE any expensive frame decode: brand,
    duration, track count, first track's handler + codec fourcc, all
    parsed from the ISO-BMFF box structure (functions/mp4.py, from
    spec — no codec library). Frame DECODE remains the documented
    external-library boundary; this makes everything up to that
    boundary a measured, per-row-quarantined quantity, exactly like
    ``extract_features_robust`` does for images/audio.

    Same Arrow/mapInPandas shape: the payload is pruned from the
    output; a malformed container costs one row (``probe_error``
    set), never the stage."""
    import struct as _struct

    from diagnosisextraction_ml_spark.functions.mp4 import probe_mp4

    _ROW_FAULTS = (NotImplementedError, ValueError, OSError, _struct.error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if p is None:
                    rows.append((aid, None, None, None, None, None, "null payload"))
                    continue
                try:
                    meta = probe_mp4(bytes(p))
                    t0 = meta["tracks"][0] if meta["tracks"] else {}
                    rows.append(
                        (aid, meta["brand"], meta["duration_ms"],
                         meta["n_tracks"], t0.get("handler"), t0.get("codec"),
                         None)
                    )
                except _ROW_FAULTS as e:
                    rows.append(
                        (aid, None, None, None, None, None,
                         f"{type(e).__name__}: {e}"[:200])
                    )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "brand", "duration_ms", "n_tracks",
                         "handler0", "codec0", "probe_error"],
            )

    return media.select("asset_id", "payload").mapInPandas(
        run, VIDEO_PROBE_SCHEMA
    )


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
