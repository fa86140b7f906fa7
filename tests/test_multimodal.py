"""Multimodal column tests — binary payload plumbing with the
deterministic fake decoder (no codec libs in this container)."""

from __future__ import annotations

import pytest

from diagnosisextraction_ml_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    default_decoder,
    documents_as_media,
    extract_features,
    fake_decoder,
    frame_sample_plan,
    resize_plan,
)


def test_default_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        default_decoder(b"bytes")


def test_fake_decoder_deterministic():
    a, b = fake_decoder(b"same"), fake_decoder(b"same")
    assert (a == b).all() and len(a) == 8
    assert (fake_decoder(b"other") != a).any()


def test_extract_features(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = documents_as_media(docs)
    assert [(f.name, f.dataType) for f in media.schema.fields] == [
        (f.name, f.dataType) for f in MEDIA_SCHEMA.fields
    ]
    feats = extract_features(media, decoder=fake_decoder)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    assert "payload" not in feats.columns  # bytes pruned from output
    # deterministic under repartition
    again = sorted(
        (r["asset_id"], tuple(r["feature"]))
        for r in extract_features(media.repartition(5), decoder=fake_decoder).collect()
    )
    assert again == sorted((r["asset_id"], tuple(r["feature"])) for r in rows)


def test_frame_sample_plan(spark):
    rows = [
        (1, "video", None, None, None, None, 3500.0),
        (2, "video", None, None, None, None, 100000.0),
        (3, "image", None, None, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = frame_sample_plan(media, every_ms=1000.0, max_frames=16)
    by_asset = {}
    for r in out.collect():
        by_asset.setdefault(r["asset_id"], []).append(r["frame_ts_ms"])
    assert sorted(by_asset[1]) == [0.0, 1000.0, 2000.0]
    assert len(by_asset[2]) == 16  # capped
    assert 3 not in by_asset  # images not sampled


def test_resize_plan(spark):
    rows = [(1, "image", None, None, 1000, 500, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    r = resize_plan(media, 100, 100).collect()[0]
    assert r["resized_w"] == 100 and r["resized_h"] == 50
    assert r["resize_scale"] == pytest.approx(0.1)


def test_real_png_decode_through_mapinpandas(spark):
    """End-to-end REAL image decode: tiny PNGs (encoded by the stdlib
    from-spec codec) flow through MEDIA_SCHEMA binary payloads and
    mapInPandas Arrow batches; the emitted features match a local
    numpy computation on the source pixels exactly."""
    import numpy as np

    from diagnosisextraction_ml_spark.functions.png import (
        decode_png,
        encode_png,
        png_feature_decoder,
    )

    rng = np.random.RandomState(42)
    imgs = {
        1: rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8),   # RGB
        2: rng.randint(0, 256, size=(3, 3, 4), dtype=np.uint8),   # RGBA
        3: rng.randint(0, 256, size=(5, 2), dtype=np.uint8),      # gray
    }
    rows = [
        (aid, "image", "image/png", bytearray(encode_png(a)),
         a.shape[1], a.shape[0], None)
        for aid, a in imgs.items()
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["asset_id"]: (r["n_bytes"], tuple(r["feature"]))
        for r in extract_features(media, decoder=png_feature_decoder).collect()
    }
    for aid, a in imgs.items():
        png = encode_png(a)
        assert np.array_equal(decode_png(png), a if a.ndim == 3 else a[:, :, None])
        want = tuple(png_feature_decoder(png))
        assert out[aid] == (len(png), want)
        # width/height land in the first two feature slots
        assert out[aid][1][0] == float(a.shape[1]) and out[aid][1][1] == float(a.shape[0])


def test_wav_codec_round_trip_and_rejects():
    """From-spec WAV codec: encode→decode is lossless up to PCM
    quantization for 8/16/32-bit mono and stereo; garbage rejected."""
    import numpy as np
    import pytest

    from diagnosisextraction_ml_spark.functions.wav import decode_wav, encode_wav

    t = np.arange(800) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    stereo = np.stack([sine, -sine], axis=1)
    for sig, bits, tol in [
        (sine, 16, 1 / 32767),
        (sine, 32, 1e-9),
        (sine, 8, 1 / 127),
        (stereo, 16, 1 / 32767),
    ]:
        payload = encode_wav(sig, 8000, bits=bits)
        back, sr = decode_wav(payload)
        assert sr == 8000
        want = sig[:, None] if sig.ndim == 1 else sig
        assert back.shape == want.shape
        assert np.abs(back - want).max() <= tol * 1.01
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data chunks


def test_real_wav_decode_through_mapinpandas(spark):
    """End-to-end REAL audio decode: PCM WAVs flow through MEDIA_SCHEMA
    binary payloads and mapInPandas; emitted features (rate, channels,
    frames, duration, rms, peak, zcr, mean) match local numpy exactly."""
    import numpy as np

    from diagnosisextraction_ml_spark.functions.wav import (
        encode_wav,
        wav_feature_decoder,
    )

    t = np.arange(1600) / 16000.0
    sigs = {
        10: 0.5 * np.sin(2 * np.pi * 440.0 * t),                # mono sine
        11: np.stack([np.sin(2 * np.pi * 220.0 * t)] * 2, 1),   # stereo
        12: np.zeros(100),                                      # silence
    }
    rows = [
        (aid, "audio", "audio/wav", bytearray(encode_wav(s, 16000)),
         None, None, 1000.0 * (s.shape[0] / 16000.0))
        for aid, s in sigs.items()
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["asset_id"]: (r["n_bytes"], tuple(r["feature"]))
        for r in extract_features(media, decoder=wav_feature_decoder).collect()
    }
    for aid, s in sigs.items():
        payload = encode_wav(s, 16000)
        assert out[aid] == (len(payload), tuple(wav_feature_decoder(payload)))
    # physical sanity: 440 Hz sine at 0.5 amplitude → rms ≈ 0.5/√2,
    # zcr ≈ 2·440/16000; silence → rms = 0
    _, f = out[10]
    assert f[0] == 16000.0 and f[1] == 1.0 and f[2] == 1600.0
    assert abs(f[4] - 0.5 / np.sqrt(2)) < 0.01
    assert abs(f[6] - 2 * 440 / 16000) < 0.01
    assert out[12][1][4] == 0.0


def test_extract_features_robust_mixed_format_batch(spark):
    """A mixed batch — valid PNG, valid WAV, a video-container payload
    (the remaining no-codec boundary), a
    truncated PNG, and a NULL payload — must produce one row each:
    real features + NULL decode_error for the decodable rows, typed
    NULL features + a decode_error string for the rest. One stray
    format must never fail the stage."""
    import numpy as np

    from diagnosisextraction_ml_spark.functions.png import (
        encode_png,
        png_feature_decoder,
    )
    from diagnosisextraction_ml_spark.functions.wav import (
        encode_wav,
        wav_feature_decoder,
    )
    from diagnosisextraction_ml_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features_robust,
    )

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
    png = encode_png(img)
    wav = encode_wav(rng.randint(-3000, 3000, size=64).astype(np.int16), 8000)
    video_ish = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 24  # MP4 ftyp box
    truncated = png[:12]                              # magic ok, body gone
    rows = [
        (1, "image", "image/png", bytearray(png), 4, 4, None),
        (2, "audio", "audio/wav", bytearray(wav), None, None, 8.0),
        (3, "video", "video/mp4", bytearray(video_ish), None, None, None),
        (4, "image", "image/png", bytearray(truncated), None, None, None),
        (5, "image", None, None, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["asset_id"]: r for r in extract_features_robust(media).collect()}
    assert len(out) == 5
    assert out[1]["decode_error"] is None
    assert tuple(out[1]["feature"]) == tuple(png_feature_decoder(png))
    assert out[2]["decode_error"] is None
    assert tuple(out[2]["feature"]) == tuple(wav_feature_decoder(wav))
    assert out[3]["feature"] is None and "NotImplementedError" in out[3]["decode_error"]
    assert out[4]["feature"] is None and out[4]["decode_error"]
    assert out[5]["feature"] is None and out[5]["decode_error"] == "null payload"
    assert out[3]["n_bytes"] == len(video_ish) and out[5]["n_bytes"] == 0


def test_extract_features_robust_catches_struct_and_zlib_faults(spark):
    """The two corruption modes that do NOT surface as ValueError —
    truncation mid-chunk-header (struct.error: the 4-byte length field
    unpack runs out of bytes) and a bit-flipped IDAT payload
    (zlib.error from inflate) — must also cost one row, not the stage.
    Driver-side repro first so the test documents which exception each
    corruption actually raises."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from diagnosisextraction_ml_spark.functions.png import (
        decode_png,
        encode_png,
    )
    from diagnosisextraction_ml_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features_robust,
    )

    rng = np.random.RandomState(7)
    png = encode_png(rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8))
    mid_header = png[:10]  # inside the IHDR length/type fields
    with pytest.raises((struct.error, ValueError)):
        decode_png(mid_header)
    # flip one bit inside the IDAT deflate payload (skip 8B magic +
    # IHDR; find the IDAT tag and corrupt past its header)
    idat = png.index(b"IDAT")
    flipped = bytearray(png)
    flipped[idat + 8] ^= 0x40
    with pytest.raises((zlib.error, ValueError)):
        decode_png(bytes(flipped))

    rows = [
        (1, "image", "image/png", bytearray(png), 6, 5, None),
        (2, "image", "image/png", bytearray(mid_header), None, None, None),
        (3, "image", "image/png", flipped, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["asset_id"]: r for r in extract_features_robust(media).collect()}
    assert out[1]["decode_error"] is None and out[1]["feature"] is not None
    assert out[2]["feature"] is None and out[2]["decode_error"]
    assert out[3]["feature"] is None and out[3]["decode_error"]
