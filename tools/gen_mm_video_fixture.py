"""Generate the frozen video-container probe fixture.

Companion to gen_mm_fixture.py for the VIDEO boundary: writes
``diagnosisextraction_ml_spark/data/mm_video_fixture.parquet`` — a
deterministic corpus of ISO-BMFF payloads spanning the probe's
outcomes (healthy 1- and 2-track files, a moov-less stream, corrupt
box sizes, truncation inside mvhd, non-MP4 bytes) plus GROUND-TRUTH
columns recorded here at generation time by running the same
``probe_mp4`` the distributed query uses. The registered
``mm_video_probe`` query then scores the mapInPandas probe against
this frozen truth — same doctrine as mm_decode_health.

Usage: python tools/gen_mm_video_fixture.py
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from diagnosisextraction_ml_spark.functions.mp4 import (  # noqa: E402
    build_mp4_stub,
    probe_mp4,
)

OUT = os.path.join(
    _REPO_ROOT, "diagnosisextraction_ml_spark", "data",
    "mm_video_fixture.parquet",
)

MODES = (
    "mp4_1track",
    "mp4_av_2track",
    "mp4_no_moov",
    "mp4_bad_boxsize",
    "mp4_trunc_mvhd",
    "not_a_container",
)
ROWS_PER_MODE = 40


def make_payload(mode: str, i: int) -> bytes:
    rng = np.random.RandomState(2000 + i)
    dur = 500.0 + 250.0 * (i % 8)
    if mode == "mp4_1track":
        return build_mp4_stub(dur, 1000, [("vide", "avc1")])
    if mode == "mp4_av_2track":
        return build_mp4_stub(dur, 90000, [("vide", "hvc1"), ("soun", "mp4a")])
    full = build_mp4_stub(dur, 1000, [("vide", "avc1")])
    if mode == "mp4_no_moov":
        moov = full.index(b"moov") - 4
        return full[:moov]  # ftyp only
    if mode == "mp4_bad_boxsize":
        moov = full.index(b"moov") - 4
        return full[:moov] + struct.pack(">I", 2**31) + full[moov + 4:]
    if mode == "mp4_trunc_mvhd":
        mvhd = full.index(b"mvhd")
        return full[: mvhd + 8 + (i % 10)]  # cut inside mvhd fields
    if mode == "not_a_container":
        return rng.bytes(24 + i % 16)
    raise AssertionError(mode)


def classify(payload: bytes):
    try:
        meta = probe_mp4(payload)
        t0 = meta["tracks"][0] if meta["tracks"] else {}
        return (meta["brand"], meta["duration_ms"], meta["n_tracks"],
                t0.get("codec"), None)
    except (NotImplementedError, ValueError, OSError, struct.error) as e:
        return (None, None, None, None, type(e).__name__)


def main() -> int:
    cols = {k: [] for k in (
        "asset_id", "mode", "payload", "expected_brand",
        "expected_duration_ms", "expected_n_tracks", "expected_codec0",
        "expected_error_class",
    )}
    aid = 0
    for i in range(ROWS_PER_MODE):
        for mode in MODES:
            p = make_payload(mode, i)
            brand, dur, ntr, codec, err = classify(p)
            cols["asset_id"].append(aid)
            cols["mode"].append(mode)
            cols["payload"].append(p)
            cols["expected_brand"].append(brand)
            cols["expected_duration_ms"].append(dur)
            cols["expected_n_tracks"].append(ntr)
            cols["expected_codec0"].append(codec)
            cols["expected_error_class"].append(err)
            aid += 1
    table = pa.table(
        {
            "asset_id": pa.array(cols["asset_id"], pa.int64()),
            "mode": pa.array(cols["mode"], pa.string()),
            "payload": pa.array(cols["payload"], pa.binary()),
            "expected_brand": pa.array(cols["expected_brand"], pa.string()),
            "expected_duration_ms": pa.array(
                cols["expected_duration_ms"], pa.float64()
            ),
            "expected_n_tracks": pa.array(
                cols["expected_n_tracks"], pa.int32()
            ),
            "expected_codec0": pa.array(cols["expected_codec0"], pa.string()),
            "expected_error_class": pa.array(
                cols["expected_error_class"], pa.string()
            ),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    from collections import Counter

    print(f"wrote {table.num_rows} rows -> {OUT}")
    print(Counter(zip(cols["mode"], cols["expected_error_class"])))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
