"""Generate the frozen mixed-corruption media fixture.

Writes ``diagnosisextraction_ml_spark/data/mm_corrupt_fixture.parquet``:
a deterministic corpus of PNG/WAV payloads spanning every decode
outcome the robust extractor handles — healthy rows, truncation
mid-chunk-header (struct.error), bit-flipped IDAT deflate payload
(zlib.error), unknown magic bytes (NotImplementedError), semantic
corruption (ValueError), and NULL payloads — plus the GROUND-TRUTH
outcome per row (``expected_error_class``), recorded here at
generation time by running the same sniffing decoder the distributed
query uses. The registered ``mm_decode_health`` query then measures
the distributed decode against this frozen truth: any drift between
the mapInPandas path and the recorded outcome is a hash mismatch.

Deterministic (seeded per asset_id); re-run only to change the corpus
shape, then re-freeze oracles.

Usage: python tools/gen_mm_fixture.py
"""

from __future__ import annotations

import os
import struct
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from diagnosisextraction_ml_spark.functions.bmp import encode_bmp  # noqa: E402
from diagnosisextraction_ml_spark.functions.jpeg import encode_jpeg  # noqa: E402
from diagnosisextraction_ml_spark.functions.png import encode_png  # noqa: E402
from diagnosisextraction_ml_spark.functions.wav import encode_wav  # noqa: E402
from diagnosisextraction_ml_spark.operators.multimodal import (  # noqa: E402
    sniffing_decoder,
)

OUT = os.path.join(
    _REPO_ROOT, "diagnosisextraction_ml_spark", "data",
    "mm_corrupt_fixture.parquet",
)

MODES = (
    "png_ok",
    "wav_ok",
    "bmp_ok",
    "jpeg_ok",
    "png_trunc_header",
    "png_idat_bitflip",
    "bmp_trunc_header",
    "bmp_trunc_pixels",
    "jpeg_trunc_entropy",
    "jpeg_progressive",
    "unknown_magic",
    "null_payload",
)
ROWS_PER_MODE = 50


def make_payload(mode: str, i: int) -> bytes | None:
    rng = np.random.RandomState(1000 + i)
    if mode == "null_payload":
        return None
    if mode == "unknown_magic":
        # MP4 ftyp box + noise: video containers are the remaining
        # external-library boundary now that baseline JPEG decodes
        return b"\x00\x00\x00\x18ftypmp42" + rng.bytes(16 + i % 32)
    if mode.startswith("jpeg"):
        h, w = 8 + i % 9, 8 + (i // 3) % 9
        jpg = encode_jpeg(
            rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8), quality=85
        )
        if mode == "jpeg_ok":
            return jpg
        if mode == "jpeg_trunc_entropy":
            # cut inside the entropy-coded segment (ValueError)
            return jpg[: len(jpg) - 10 - (i % 20)]
        if mode == "jpeg_progressive":
            # flip SOF0 -> SOF2: the documented progressive boundary
            return jpg.replace(b"\xff\xc0", b"\xff\xc2", 1)
        raise AssertionError(mode)
    if mode == "wav_ok":
        n = 32 + (i % 64)
        sig = rng.randint(-3000, 3000, size=n).astype(np.int16)
        return encode_wav(sig, 8000)
    if mode.startswith("bmp"):
        h, w = 3 + i % 5, 3 + (i // 5) % 5
        bmp = encode_bmp(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))
        if mode == "bmp_ok":
            return bmp
        if mode == "bmp_trunc_header":
            # cut inside the fixed-width BITMAPINFOHEADER fields: the
            # <iihHI unpack runs out of bytes (struct.error)
            return bmp[: 16 + (i % 14)]
        if mode == "bmp_trunc_pixels":
            # headers intact, pixel array short: semantic ValueError
            return bmp[: 54 + (i % max(1, (len(bmp) - 54) // 2))]
        raise AssertionError(mode)
    h, w = 3 + i % 5, 3 + (i // 5) % 5
    png = encode_png(rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8))
    if mode == "png_ok":
        return png
    if mode == "png_trunc_header":
        # cut inside a chunk's 4-byte length/type fields: the
        # fixed-width unpack runs out of bytes (struct.error)
        return png[: 8 + (i % 6)]
    if mode == "png_idat_bitflip":
        idat = png.index(b"IDAT")
        flipped = bytearray(png)
        flipped[idat + 8 + i % 4] ^= 0x40
        return bytes(flipped)
    raise AssertionError(mode)


def classify(payload: bytes | None) -> str | None:
    """The ground truth: the same per-row outcome extract_features_
    robust records, reduced to the exception class name."""
    if payload is None:
        return "null payload"
    try:
        sniffing_decoder(payload)
        return None
    except (NotImplementedError, ValueError, OSError, struct.error, zlib.error) as e:
        return type(e).__name__


def main() -> int:
    ids, modes, payloads, expected = [], [], [], []
    aid = 0
    for i in range(ROWS_PER_MODE):
        for mode in MODES:
            p = make_payload(mode, i)
            ids.append(aid)
            modes.append(mode)
            payloads.append(p)
            expected.append(classify(p))
            aid += 1
    table = pa.table(
        {
            "asset_id": pa.array(ids, pa.int64()),
            "mode": pa.array(modes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "expected_error_class": pa.array(expected, pa.string()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    from collections import Counter

    print(f"wrote {table.num_rows} rows -> {OUT}")
    print(Counter(zip(modes, expected)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
