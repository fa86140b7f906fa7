"""Duplicated-span removal — semantics, overlap merge, invariance."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.operators.dedup import remove_duplicated_spans


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # docs 1 and 2 share the 3-gram "x y z" (plus doc 1 continues
        # "z w": overlap of covered [2,5) with gram at pos 2? no —
        # only "x y z" is duplicated)
        (1, "a b x y z w q"),
        (2, "c d x y z e f"),
        # doc 3 repeats a 3-gram within itself: both occurrences cut
        (3, "p q r s p q r t"),
        # doc 4 shorter than n: never cut
        (4, "x y"),
        # doc 5 unique text: untouched
        (5, "one two three four five"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def cleaned(corpus):
    return {
        r.doc_id: r
        for r in remove_duplicated_spans(corpus, n=3, min_count=2).collect()
    }


def test_cross_doc_span_cut(cleaned):
    # "x y z" at positions 2-4 in both docs
    assert cleaned[1].cleaned_text == "a b w q"
    assert cleaned[1].n_removed == 3
    assert cleaned[2].cleaned_text == "c d e f"


def test_within_doc_repeat_cut(cleaned):
    # "p q r" occurs at pos 0 and 4 -> covered {0,1,2, 4,5,6}
    assert cleaned[3].cleaned_text == "s t"
    assert cleaned[3].n_removed == 6


def test_short_and_unique_docs_untouched(cleaned):
    assert cleaned[4].cleaned_text == "x y" and cleaned[4].n_removed == 0
    assert cleaned[5].cleaned_text == "one two three four five"
    assert cleaned[5].n_removed == 0


def test_overlapping_spans_merge(spark):
    # "a b c d" in both docs: grams "a b c" and "b c d" both duplicated
    # -> covered {0,1,2,3}, removed once each, not double-counted
    df = spark.createDataFrame(
        [(1, "a b c d x"), (2, "y a b c d")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in remove_duplicated_spans(df, n=3).collect()}
    assert out[1].cleaned_text == "x" and out[1].n_removed == 4
    assert out[2].cleaned_text == "y" and out[2].n_removed == 4


def test_normalization_lowercase_ws(spark):
    # case-insensitive match, whitespace collapsed in output
    df = spark.createDataFrame(
        [(1, "Foo  Bar Baz tail"), (2, "foo bar BAZ other")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicated_spans(df, n=3).collect()}
    assert out[1].cleaned_text == "tail"
    assert out[2].cleaned_text == "other"


def test_partitioning_invariance(spark, corpus):
    a = sorted(map(tuple, remove_duplicated_spans(corpus.coalesce(1), n=3).collect()))
    b = sorted(
        map(tuple, remove_duplicated_spans(corpus.repartition(7), n=3).collect())
    )
    assert a == b


def test_every_doc_present(spark, corpus, cleaned):
    assert set(cleaned) == {1, 2, 3, 4, 5}
    for r in cleaned.values():
        assert r.n_tokens >= r.n_removed >= 0


# ---------------------------------------------------------------------------
# duplicated_span_intervals — the multi-length maximal-span view
# ---------------------------------------------------------------------------

def test_span_intervals_multi_length(spark):
    from diagnosisextraction_ml_spark.operators.dedup import (
        duplicated_span_intervals,
    )

    rows = [
        # docs 1/2 share a 5-token run "u v w x y" (3-grams at pos 2,3,4
        # all duplicated -> ONE island of length 5) and, disjointly,
        # the 3-token run "m n o" at the tail of doc 1 / head of doc 3.
        (1, "a b u v w x y q m n o"),
        (2, "c d u v w x y e f"),
        (3, "m n o z z2 z3"),
        (4, "unique words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        (r.doc_id, r.span_start): r.span_len
        for r in duplicated_span_intervals(df, n=3, min_count=2).collect()
    }
    assert spans[(1, 2)] == 5   # maximal span length recovered, not 3
    assert spans[(1, 8)] == 3   # the disjoint short span is separate
    assert spans[(2, 2)] == 5
    assert spans[(3, 0)] == 3
    assert not any(d == 4 for d, _ in spans)  # unique doc: no spans
    assert all(l >= 3 for l in spans.values())


def test_span_intervals_sum_equals_removed(spark, corpus):
    """Σ span_len per doc == remove_duplicated_spans' n_removed (same
    coverage semantics, two views)."""
    from diagnosisextraction_ml_spark.operators.dedup import (
        duplicated_span_intervals,
    )

    per_doc = {
        r.doc_id: r.total
        for r in duplicated_span_intervals(corpus, n=3, min_count=2)
        .groupBy("doc_id")
        .agg(F.sum("span_len").alias("total"))
        .collect()
    }
    removed = {
        r.doc_id: r.n_removed
        for r in remove_duplicated_spans(corpus, n=3, min_count=2).collect()
    }
    for doc_id, n_removed in removed.items():
        assert per_doc.get(doc_id, 0) == n_removed


def test_span_intervals_partitioning_invariance(spark, corpus):
    from diagnosisextraction_ml_spark.operators.dedup import (
        duplicated_span_intervals,
    )

    a = sorted(
        map(tuple, duplicated_span_intervals(corpus.coalesce(1), n=3).collect())
    )
    b = sorted(
        map(tuple, duplicated_span_intervals(corpus.repartition(7), n=3).collect())
    )
    assert a == b and len(a) > 0
