"""Property-based tests (hypothesis) for the pure-Python function layer
— no SparkSession needed, so these run in milliseconds."""

from __future__ import annotations

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from diagnosisextraction_ml_spark.functions.stats import t_sf
from diagnosisextraction_ml_spark.functions.stemmer import stem_dutch
from diagnosisextraction_ml_spark.functions.typo import (
    damerau_levenshtein,
    normalized_damerau_levenshtein,
)

words = st.text(alphabet="abcdefghijklmnopqrstuvwxyzëéè", min_size=0, max_size=12)


@given(words)
@settings(max_examples=200, deadline=None)
def test_stemmer_never_grows_and_is_lowercase(w):
    s = stem_dutch(w)
    assert len(s) <= len(w)
    assert s == s.lower()


@given(words, words)
@settings(max_examples=200, deadline=None)
def test_osa_symmetric_and_bounded(a, b):
    d = damerau_levenshtein(a, b)
    assert d == damerau_levenshtein(b, a)
    assert 0 <= d <= max(len(a), len(b))
    assert (d == 0) == (a == b)
    n = normalized_damerau_levenshtein(a, b)
    assert 0.0 <= n <= 1.0


@given(words)
@settings(max_examples=200, deadline=None)
def test_osa_single_edit_is_distance_one(w):
    # appending a char / transposing the last two chars are 1 edit
    assert damerau_levenshtein(w, w + "x") == 1
    if len(w) >= 2 and w[-1] != w[-2]:
        assert damerau_levenshtein(w, w[:-2] + w[-1] + w[-2]) == 1


@given(st.floats(min_value=0.0, max_value=50.0), st.integers(min_value=1, max_value=100))
@settings(max_examples=200, deadline=None)
def test_t_sf_range_and_monotonicity(t, df):
    p = t_sf(t, df)
    assert 0.0 <= p <= 0.5 + 1e-12
    assert t_sf(t + 1.0, df) <= p + 1e-12


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=40),
)
@settings(max_examples=200, deadline=None)
def test_greedy_next_fit_bins_characterization(counts, budget):
    """The two directions that pin next-fit exactly: (a) a bin never
    exceeds the budget unless it is a single oversized item, and (b) a
    new bin opens ONLY when the item would not have fit (greedy — no
    premature splits)."""
    from diagnosisextraction_ml_spark.operators.textstats import greedy_next_fit_bins

    bins = greedy_next_fit_bins(counts, budget)
    assert len(bins) == len(counts)
    assert bins[0] == 0
    fills: dict[int, list[int]] = {}
    for b, n in zip(bins, counts):
        fills.setdefault(b, []).append(n)
    assert sorted(fills) == list(range(len(fills)))  # contiguous
    for b, items in fills.items():
        assert sum(items) <= budget or len(items) == 1
    for i in range(1, len(counts)):
        assert bins[i] in (bins[i - 1], bins[i - 1] + 1)
        if bins[i] == bins[i - 1] + 1:
            prev_fill = sum(
                counts[j] for j in range(i) if bins[j] == bins[i - 1]
            )
            assert prev_fill + counts[i] > budget


# --- mojibake repair (pure-Python application of the same map the
# Spark chain applies in the same order) ---

from diagnosisextraction_ml_spark.functions.mojibake import (  # noqa: E402
    MOJIBAKE_MAP,
    _REPAIR_TARGETS,
    make_mojibake,
)


def _apply_map(s: str) -> str:
    for g, ch in MOJIBAKE_MAP:
        s = s.replace(g, ch)
    return s


repairable = st.text(
    alphabet="abc XYZ.,!?" + _REPAIR_TARGETS, min_size=0, max_size=40
)


@given(repairable)
@settings(max_examples=300, deadline=None)
def test_mojibake_roundtrip_property(s):
    # Inherent ambiguity caveat (same as ftfy): a text that itself
    # contains a garble sequence ("Ã©" typed literally) is
    # indistinguishable from damage, so roundtrip is only promised for
    # inputs that are fixed points of the repair map.
    assume(_apply_map(s) == s)
    assert _apply_map(make_mojibake(s)) == s


@given(st.text(alphabet="abcdefgh 0123456789.,", min_size=0, max_size=40))
@settings(max_examples=200, deadline=None)
def test_mojibake_ascii_fixed_point(s):
    # pure-ASCII text garbles to itself and repairs to itself
    assert make_mojibake(s) == s
    assert _apply_map(s) == s
