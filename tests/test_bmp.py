"""From-spec BMP codec (functions/bmp.py): round-trip fidelity,
row-direction and depth handling, the fault surface
extract_features_robust relies on, and the sniffing-decoder dispatch
that makes BMP a REAL decode path through mapInPandas."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from diagnosisextraction_ml_spark.functions.bmp import (
    bmp_feature_decoder,
    decode_bmp,
    encode_bmp,
)


def test_round_trip_24bit_exact():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (3, 5), (4, 4), (7, 3)]:  # odd widths hit padding
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_top_down_negative_height():
    """A negative DIB height means rows are stored top-first; the
    decoder must return the same image either way."""
    img = np.arange(3 * 4 * 3, dtype=np.uint8).reshape(3, 4, 3)
    bottom_up = bytearray(encode_bmp(img))
    # flip stored row order and negate the height field (offset 22, i32)
    pix = 54
    stride = (4 * 3 + 3) & ~3
    rows = [bytes(bottom_up[pix + r * stride: pix + (r + 1) * stride]) for r in range(3)]
    top_down = bytes(bottom_up[:pix]) + b"".join(reversed(rows))
    top_down = top_down[:22] + struct.pack("<i", -3) + top_down[26:]
    assert np.array_equal(decode_bmp(top_down), img)


def test_32bit_bgra():
    """Hand-built 32-bit BI_RGB single pixel: BGRA on disk → RGBA out."""
    w = h = 1
    file_hdr = b"BM" + struct.pack("<IHHI", 54 + 4, 0, 0, 54)
    dib = struct.pack("<IiihHIIiiII", 40, w, h, 1, 32, 0, 4, 0, 0, 0, 0)
    payload = file_hdr + dib + bytes([10, 20, 30, 40])  # B G R A
    out = decode_bmp(payload)
    assert out.shape == (1, 1, 4)
    assert list(out[0, 0]) == [30, 20, 10, 40]


def test_fault_surface_matches_robust_contract():
    """extract_features_robust catches (NotImplementedError, ValueError,
    OSError, struct.error, zlib.error); every BMP corruption must land
    in that set — pinned per mode, like the PNG twin test."""
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    bmp = encode_bmp(img)
    with pytest.raises(ValueError, match="bad magic"):
        decode_bmp(b"XX" + bmp[2:])
    with pytest.raises(struct.error):
        decode_bmp(bmp[:20])  # mid-BITMAPINFOHEADER truncation
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bmp[:-5])  # headers fine, pixel array short
    rle = bmp[:30] + struct.pack("<I", 1) + bmp[34:]  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(rle)
    sixteen = bmp[:28] + struct.pack("<H", 16) + bmp[30:]
    with pytest.raises(ValueError, match="bit depth"):
        decode_bmp(sixteen)
    with pytest.raises(ValueError):
        decode_bmp(b"")


def test_feature_vector_convention():
    img = np.full((2, 4, 3), 128, dtype=np.uint8)
    f = bmp_feature_decoder(encode_bmp(img))
    assert f.shape == (8,)
    assert f[0] == 4.0 and f[1] == 2.0 and f[2] == 3.0
    assert abs(f[3] - 128 / 255) < 1e-12 and f[4] == 0.0


def test_real_bmp_decode_through_mapinpandas(spark):
    """End-to-end: BMP payloads decode distributed via the sniffing
    decoder — the same plumbing the PNG/WAV paths are pinned on."""
    from diagnosisextraction_ml_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features_robust,
    )

    rng = np.random.RandomState(3)
    imgs = {i: rng.randint(0, 256, size=(3 + i, 4, 3), dtype=np.uint8) for i in range(4)}
    rows = [
        (i, "image", "image/bmp", bytearray(encode_bmp(img)), 4, 3 + i, None)
        for i, img in imgs.items()
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["asset_id"]: r for r in extract_features_robust(media).collect()}
    assert len(out) == 4
    for i, img in imgs.items():
        assert out[i]["decode_error"] is None
        assert tuple(out[i]["feature"]) == tuple(bmp_feature_decoder(encode_bmp(img)))
