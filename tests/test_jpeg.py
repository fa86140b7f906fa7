"""From-spec baseline JPEG codec (functions/jpeg.py): spec vectors
(zigzag order, DCT orthonormality, canonical Huffman construction),
encode→decode round-trip fidelity, the fault surface
extract_features_robust relies on, and the sniffing-decoder dispatch
through mapInPandas. The decoder reads every table from the stream,
so round-trip validates encoder and decoder independently; it has
additionally been validated against real libjpeg output (4:2:0
subsampled, restart-free baseline files decode to correct dimensions
and recognizable content)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from diagnosisextraction_ml_spark.functions.jpeg import (
    ZIGZAG,
    _T,
    build_huffman_decoder,
    decode_jpeg,
    encode_jpeg,
    jpeg_feature_decoder,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(((a.astype(float) - b.astype(float)) ** 2).mean())
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_zigzag_is_the_spec_scan_order():
    # T.81 figure 5 — first and last entries, and a permutation of 0..63
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-4:] == [47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_dct_basis_is_orthonormal():
    assert np.allclose(_T @ _T.T, np.eye(8), atol=1e-12)


def test_canonical_huffman_construction():
    """Annex C: codes of one length are consecutive; first code of the
    next length is (last+1)<<1. Check on the Annex K DC-luma spec."""
    bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    table = build_huffman_decoder(bits, list(range(12)))
    inv = {sym: (ln, code) for (ln, code), sym in table.items()}
    assert inv[0] == (2, 0b00)           # the single 2-bit code
    assert inv[1] == (3, 0b010)          # five 3-bit codes follow
    assert inv[5] == (3, 0b110)
    assert inv[6] == (4, 0b1110)         # (110+1)<<1
    assert inv[11] == (9, 0b111111110)
    assert len(table) == 12


def test_round_trip_smooth_image_high_psnr():
    x, y = np.meshgrid(np.arange(64), np.arange(48))
    img = np.stack([(x * 3) % 256, (y * 4) % 256, ((x + y) * 2) % 256], axis=2).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 35.0


def test_round_trip_flat_is_lossless_and_odd_sizes_pad():
    flat = np.full((16, 16, 3), 130, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, quality=85)), flat)
    # non-multiple-of-8 dimensions exercise edge padding + crop
    odd = np.full((11, 13, 3), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(odd, quality=85))
    assert out.shape == (11, 13, 3)
    assert int(np.abs(out.astype(int) - 77).max()) <= 1


def test_round_trip_grayscale():
    x, y = np.meshgrid(np.arange(32), np.arange(24))
    g = ((x * 5 + y * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (24, 32, 1)
    assert _psnr(out[:, :, 0], g) > 30.0


def test_quality_knob_trades_bytes_for_fidelity():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    lo, hi = encode_jpeg(img, quality=20), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    assert _psnr(decode_jpeg(hi), img) > _psnr(decode_jpeg(lo), img)


def test_fault_surface_matches_robust_contract():
    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    jpg = encode_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"XX" + jpg[2:])
    with pytest.raises(ValueError):
        decode_jpeg(jpg[: len(jpg) - 8])  # truncated entropy data
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(jpg.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises((ValueError, struct.error)):
        decode_jpeg(jpg[:10])  # truncated mid-segment
    with pytest.raises(ValueError):
        decode_jpeg(b"")


def test_feature_vector_convention():
    img = np.full((8, 16, 3), 128, dtype=np.uint8)
    f = jpeg_feature_decoder(encode_jpeg(img, quality=90))
    assert f.shape == (8,)
    assert f[0] == 16.0 and f[1] == 8.0 and f[2] == 3.0
    assert abs(f[3] - 128 / 255) < 0.01


@pytest.mark.slow
def test_real_jpeg_decode_through_mapinpandas(spark):
    """End-to-end: JPEG payloads decode distributed via the sniffing
    decoder; a progressive payload quarantines as one row."""
    from diagnosisextraction_ml_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features_robust,
    )

    rng = np.random.RandomState(5)
    jpgs = {
        i: encode_jpeg(
            rng.randint(0, 256, size=(8 + i, 8, 3), dtype=np.uint8), quality=85
        )
        for i in range(3)
    }
    rows = [
        (i, "image", "image/jpeg", bytearray(j), 8, 8 + i, None)
        for i, j in jpgs.items()
    ]
    rows.append(
        (9, "image", "image/jpeg",
         bytearray(jpgs[0].replace(b"\xff\xc0", b"\xff\xc2", 1)), 8, 8, None)
    )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["asset_id"]: r for r in extract_features_robust(media).collect()}
    assert len(out) == 4
    for i, j in jpgs.items():
        assert out[i]["decode_error"] is None
        assert tuple(out[i]["feature"]) == tuple(jpeg_feature_decoder(j))
    assert out[9]["feature"] is None and "progressive" in out[9]["decode_error"]


def test_multi_scan_and_implausible_dims_refused():
    """Non-interleaved multi-scan files would silently decode to
    zeroed chroma; corrupt SOF dimensions would allocate gigabytes
    inside the quarantined row path — both must be loud ValueErrors."""
    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    jpg = bytearray(encode_jpeg(img))
    # shrink SOS to one component (ns=1): find the SOS marker
    sos = bytes(jpg).index(b"\xff\xda")
    one_comp = (
        bytes(jpg[:sos])
        + b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00])
        + b"\x00\x3f\x00" + bytes(jpg[sos + 2 + 12:])
    )
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(one_comp)
    # blow up the SOF dimensions (height/width at offsets +3/+5 of SOF0)
    sof = bytes(jpg).index(b"\xff\xc0")
    huge = bytes(jpg[:sof + 5]) + struct.pack(">HH", 65000, 65000) + bytes(jpg[sof + 9:])
    with pytest.raises(ValueError, match="16 MP"):
        decode_jpeg(huge)


def test_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker code — a spec-legal padded file must decode identically to
    the unpadded one (ADVICE r14)."""
    img = np.full((16, 16, 3), 120, dtype=np.uint8)
    img[4:12, 4:12] = 60
    jpg = encode_jpeg(img, quality=90)
    dqt = jpg.index(b"\xff\xdb")
    padded = jpg[:dqt] + b"\xff\xff\xff" + jpg[dqt:]  # 3 fill bytes
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(jpg))


def test_non_divisible_sampling_factors_refused_cleanly():
    """Spec-legal sampling ratios the replication upsampler can't
    express (3:2) must surface the codec's documented ValueError, not
    an np.stack shape crash (ADVICE r14)."""
    img = np.full((16, 16, 3), 90, dtype=np.uint8)
    jpg = bytearray(encode_jpeg(img))
    sof = bytes(jpg).index(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) ncomp(1), then per
    # component cid(1) HV(1) tq(1); 4:4:4 encoder writes HV=0x11
    jpg[sof + 10 + 1] = 0x33  # comp 1 -> 3x3
    jpg[sof + 13 + 1] = 0x22  # comp 2 -> 2x2; 3 % 2 != 0
    with pytest.raises(ValueError, match="unsupported sampling"):
        decode_jpeg(bytes(jpg))
