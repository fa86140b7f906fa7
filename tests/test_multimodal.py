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
