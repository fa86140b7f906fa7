"""M0 TF-IDF pipeline + M11-M13/A4 feature-introspection tests.

Expected chi2/correlation values are computed with independent numpy
formulas inside the tests (no sklearn in the container)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.ml.linalg import Vectors

from diagnosisextraction_ml_spark.plans.features import (
    build_tfidf_pipeline,
    chi_squared_features,
    feature_label_correlation,
    model_coefficients,
    tfidf_column_sums,
    top_chi_squared_terms,
    vocabulary_of,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    # 3 features, binary label; feature 0 is perfectly aligned with y,
    # feature 1 anti-aligned, feature 2 constant.
    rows = [
        (Vectors.dense([1.0, 0.0, 1.0]), 1),
        (Vectors.dense([1.0, 0.0, 1.0]), 1),
        (Vectors.dense([0.0, 1.0, 1.0]), 0),
        (Vectors.dense([0.0, 1.0, 1.0]), 0),
    ]
    return spark.createDataFrame(rows, ["features", "label"])


def test_chi_squared(vec_df):
    rows = {r["featureIndex"]: r for r in chi_squared_features(vec_df).collect()}
    # features 0/1: counts table [[2,0],[0,2]] → chi2 = n = 4
    assert rows[0]["statistic"] == pytest.approx(4.0)
    assert rows[1]["statistic"] == pytest.approx(4.0)
    assert rows[2]["statistic"] == pytest.approx(0.0)


def test_top_chi_squared_terms(vec_df):
    top = top_chi_squared_terms(vec_df, ["alpha", "beta", "gamma"], k=2)
    got = [r["term"] for r in top.collect()]
    assert got == ["alpha", "beta"]


def test_feature_label_correlation(vec_df):
    r = feature_label_correlation(vec_df)
    assert r[0] == pytest.approx(1.0)
    assert r[1] == pytest.approx(-1.0)
    assert np.isnan(r[2])  # constant feature → undefined


def test_tfidf_column_sums(vec_df, spark):
    out = {r["term"]: r["weight"] for r in tfidf_column_sums(vec_df, ["a", "b", "c"], k=3).collect()}
    assert out == {"a": 2.0, "b": 2.0, "c": 4.0}


def test_tfidf_pipeline_and_coefficients(spark):
    df = spark.createDataFrame(
        [
            ("artritis in de knie vastgesteld", 1),
            ("reuma artritis bevestigd bij controle", 1),
            ("geen bijzonderheden gezien vandaag", 0),
            ("controle verliep zonder klachten", 0),
        ]
        * 3,
        ["Text", "label"],
    )
    pipe = build_tfidf_pipeline(input_col="Text", ngram_range=(1, 2), stopwords=None)
    model = pipe.fit(df)
    out = model.transform(df)
    vocab = vocabulary_of(model)
    assert "artritis" in vocab
    first = out.select("features").first()["features"]
    assert first.size == len(vocab)
    # L2-normalized rows
    assert np.linalg.norm(first.toArray()) == pytest.approx(1.0)

    # fit a linear model on top and extract signed coefficients
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    full = Pipeline(stages=[pipe, LogisticRegression(featuresCol="features", labelCol="label")])
    fitted = full.fit(df)
    lr_stage = fitted.stages[-1]
    top_pos, top_neg = model_coefficients(
        type("M", (), {"stages": [*fitted.stages[0].stages, lr_stage]})(), vocab, k=5
    )
    pos_terms = [t for t, _ in top_pos]
    assert "artritis" in pos_terms
    assert all(w1 >= w2 for (_, w1), (_, w2) in zip(top_pos, top_pos[1:]))


def test_vocab_size_caps_driver_side_vocabulary(spark):
    """The EP2 scale control (SURVEY §7 / tools/ep2_scale.py): the
    CountVectorizer vocabulary is the one harness structure that lives
    on the DRIVER and grows with corpus content, so ``vocab_size``
    must be a hard cap — corpus growth beyond it costs recall on rare
    grams, never driver memory. Pinned: an over-cap corpus fits a
    vocabulary of exactly the cap (most-frequent-first per
    CountVectorizer's contract), and the default cap is 2^18."""
    import inspect

    from diagnosisextraction_ml_spark.plans.features import build_tfidf_stages

    rows = [(f"term{i} term{i} shared word{i % 7}",) for i in range(60)]
    df = spark.createDataFrame(rows, ["Text"])
    cap = 16
    pipe = build_tfidf_pipeline(
        input_col="Text", ngram_range=(1, 1), stopwords=None, vocab_size=cap
    )
    model = pipe.fit(df)
    vocab = vocabulary_of(model)
    assert len(vocab) == cap  # >cap distinct terms exist; cap binds
    assert "shared" in vocab  # most-frequent term survives the cut
    out = model.transform(df).select("features").first()["features"]
    assert out.size == cap  # feature width == vocab cap, everywhere
    default_cap = inspect.signature(build_tfidf_stages).parameters["vocab_size"].default
    assert default_cap == 1 << 18
