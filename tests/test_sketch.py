"""Count-min sketch — overestimate guarantee, merge law, determinism."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.operators import sketch


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "beta beta delta"),
        (3, "alpha epsilon zeta eta theta"),
        (4, ""),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact_counts(spark, corpus):
    from diagnosisextraction_ml_spark.operators.textstats import ws_tokens

    return (
        corpus.select(F.explode(ws_tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )


def test_cms_never_underestimates(spark, corpus):
    sk = sketch.cms_build(corpus)
    exact = _exact_counts(spark, corpus)
    est = sketch.cms_estimate(sk, exact).collect()
    assert len(est) == 8  # distinct tokens
    for r in est:
        assert r.cms_est >= r.exact_n, r


def test_cms_exact_at_tiny_vocab(spark, corpus):
    # 8 tokens into 4x8192 cells: collisions are possible in principle
    # but the md5 cells of these fixed tokens do not collide, so the
    # estimates are exactly the counts — pins the arithmetic.
    sk = sketch.cms_build(corpus)
    exact = _exact_counts(spark, corpus)
    for r in sketch.cms_estimate(sk, exact).collect():
        assert r.cms_est == r.exact_n, r


def test_cms_total_mass_per_row(spark, corpus):
    # Every row of the grid sums to the total token count — the sketch
    # is a partition of the occurrence stream, per row.
    sk = sketch.cms_build(corpus).collect()
    total_tokens = 12  # count the fixture's tokens
    by_row = {}
    for r in sk:
        by_row[r.cms_row] = by_row.get(r.cms_row, 0) + r.cnt
    assert by_row == {r: total_tokens for r in range(sketch.DEPTH)}


def test_cms_merge_is_cellwise_sum(spark, corpus):
    # Sketch(a ∪ b) == cellwise Sketch(a) + Sketch(b): the monoid law
    # that makes map-side combine (and cross-day sketch merging) valid.
    a = corpus.filter(F.col("doc_id") <= 2)
    b = corpus.filter(F.col("doc_id") > 2)
    whole = {
        (r.cms_row, r.cms_col): r.cnt for r in sketch.cms_build(corpus).collect()
    }
    merged: dict[tuple[int, int], int] = {}
    for part in (a, b):
        for r in sketch.cms_build(part).collect():
            key = (r.cms_row, r.cms_col)
            merged[key] = merged.get(key, 0) + r.cnt
    assert merged == whole


def test_cms_partitioning_invariance(spark, corpus):
    one = {
        (r.cms_row, r.cms_col): r.cnt
        for r in sketch.cms_build(corpus.coalesce(1)).collect()
    }
    many = {
        (r.cms_row, r.cms_col): r.cnt
        for r in sketch.cms_build(corpus.repartition(7)).collect()
    }
    assert one == many


def test_cms_estimate_unseen_token_is_zero_or_collision(spark, corpus):
    sk = sketch.cms_build(corpus)
    cand = spark.createDataFrame([("nosuchtoken",)], "token string")
    [r] = sketch.cms_estimate(sk, cand).collect()
    # true count 0; estimate is >= 0 and only > 0 under cell collision
    assert r.cms_est >= 0
