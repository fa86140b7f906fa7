"""ISO-BMFF metadata probe (functions/mp4.py + multimodal.
probe_video_metadata): builder/probe round trip, the fault surface
the robust wrapper quarantines on, and the distributed mapInPandas
path scored against the frozen fixture's generation-time truth."""

from __future__ import annotations

import struct

import pytest

from diagnosisextraction_ml_spark.functions.mp4 import (
    build_mp4_stub,
    probe_mp4,
)


def test_probe_round_trips_builder_metadata():
    p = probe_mp4(build_mp4_stub(1500.0, 90000, [("vide", "hvc1"), ("soun", "mp4a")]))
    assert p["brand"] == "mp42"
    assert p["duration_ms"] == 1500.0
    assert p["timescale"] == 90000
    assert p["n_tracks"] == 2
    assert p["tracks"][0] == {"handler": "vide", "codec": "hvc1"}
    assert p["tracks"][1] == {"handler": "soun", "codec": "mp4a"}


def test_probe_fault_surface():
    full = build_mp4_stub(1000.0)
    with pytest.raises(ValueError, match="ftyp"):
        probe_mp4(b"\x00" * 32)
    with pytest.raises(ValueError, match="moov"):
        probe_mp4(full[: full.index(b"moov") - 4])
    bad = bytearray(full)
    moov = full.index(b"moov") - 4
    bad[moov:moov + 4] = struct.pack(">I", 2**31)  # size past buffer
    with pytest.raises(ValueError, match="box size"):
        probe_mp4(bytes(bad))
    with pytest.raises(ValueError):
        probe_mp4(b"")
    # zero timescale is semantic corruption, not a crash
    z = bytearray(full)
    mvhd = full.index(b"mvhd")
    z[mvhd + 16:mvhd + 20] = struct.pack(">I", 0)
    with pytest.raises(ValueError, match="timescale"):
        probe_mp4(bytes(z))


def test_probe_video_metadata_distributed(spark):
    """mapInPandas probe over the frozen fixture must reproduce the
    generation-time ground truth row-for-row — healthy rows carry the
    metadata, malformed ones carry a typed probe_error."""
    import os

    from diagnosisextraction_ml_spark.operators.multimodal import (
        probe_video_metadata,
    )

    fx_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "diagnosisextraction_ml_spark", "data", "mm_video_fixture.parquet",
    )
    fx = spark.read.parquet(fx_path)
    got = {r["asset_id"]: r for r in probe_video_metadata(fx).collect()}
    want = fx.collect()
    assert len(got) == len(want) == 240
    for w in want:
        g = got[w["asset_id"]]
        if w["expected_error_class"] is None:
            assert g["probe_error"] is None
            assert g["brand"] == w["expected_brand"]
            assert g["duration_ms"] == w["expected_duration_ms"]
            assert g["n_tracks"] == w["expected_n_tracks"]
            assert g["codec0"] == w["expected_codec0"]
        else:
            assert g["probe_error"] is not None
            assert g["probe_error"].split(":")[0] == w["expected_error_class"]
