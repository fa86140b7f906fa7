"""DSIR importance resampling + winnowing fingerprints.

Both operators are pinned against independent Python brute-force
re-implementations (same md5 hash, same arithmetic), plus the
structural properties that make them trustworthy at scale:
partition invariance and the winnowing match guarantee.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from diagnosisextraction_ml_spark.operators import dsir, winnow

B = dsir.DEFAULT_BUCKETS
K, W = winnow.DEFAULT_K, winnow.DEFAULT_W
POS_MOD = 1 << 22
HASH_MOD = 1 << 40


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# Python brute-force twins
# ---------------------------------------------------------------------------

def _grams(text: str) -> list[str]:
    toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_dsir_scores(rows: list[tuple[int, str, int]]) -> dict[int, tuple[int, int]]:
    """id -> (n_grams, logw_micro); rows are (id, text, is_target)."""
    t_n: dict[int, int] = {}
    r_n: dict[int, int] = {}
    for _, text, tgt in rows:
        for g in _grams(text):
            b = _h(g) % B
            r_n[b] = r_n.get(b, 0) + 1
            if tgt:
                t_n[b] = t_n.get(b, 0) + 1
    T = sum(t_n.values())
    R = sum(r_n.values())
    ratio = {
        b: round(
            1e6
            * (
                math.log(t_n.get(b, 0) + 1)
                - math.log(T + B)
                - math.log(r_n[b] + 1)
                + math.log(R + B)
            )
        )
        for b in r_n
    }
    default = round(1e6 * (math.log(R + B) - math.log(T + B)))
    out = {}
    for i, text, _ in rows:
        gs = _grams(text)
        out[i] = (
            len(gs),
            sum(ratio.get(_h(g) % B, default) for g in gs),
        )
    return out


def _py_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    """Set of (pos, fp_hash) winnowing fingerprints."""
    s = re.sub(r"\s+", " ", text.strip().lower())
    n = len(s) - k + 1
    if n < 1:
        return set()
    packed = [
        (_h(s[i - 1 : i - 1 + k]) % HASH_MOD) * POS_MOD + (POS_MOD - 1 - i)
        for i in range(1, n + 1)
    ]
    sel = set()
    for i in range(min(w, n), n + 1):
        sel.add(min(packed[max(0, i - w) : i]))
    return {(POS_MOD - 1 - (p % POS_MOD), p // POS_MOD) for p in sel}


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------

_CORPUS = [
    (1, "the cat sat on the mat", 1),
    (2, "the dog sat on the log", 1),
    (3, "cats and dogs are pets", 1),
    (4, "der hund sitzt auf dem baum", 0),
    (5, "el gato come pescado fresco", 0),
    (6, "the cat and the dog", 1),
    (7, "baum und hund und katze", 0),
    (8, "one", 0),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(_CORPUS, ["doc_id", "text", "tgt"])


def test_gram_buckets_match_bruteforce(spark, corpus_df):
    got = sorted(
        (r.doc_id, r.bucket)
        for r in dsir.hashed_gram_buckets(corpus_df).collect()
    )
    want = sorted(
        (i, _h(g) % B) for i, text, _ in _CORPUS for g in _grams(text)
    )
    assert got == want


def test_score_importance_matches_bruteforce(spark, corpus_df):
    ratios = dsir.fit_log_ratio(corpus_df, "tgt")
    got = {
        r.doc_id: (r.n_grams, r.logw_micro)
        for r in dsir.score_importance(corpus_df, ratios).collect()
    }
    assert got == _py_dsir_scores(_CORPUS)
    # English docs must score above non-English ones on average
    en = [got[i][1] for i in (1, 2, 3, 6)]
    other = [got[i][1] for i in (4, 5, 7)]
    assert min(en) > max(other)


def test_score_unseen_corpus_uses_default(spark, corpus_df):
    """Scoring a disjoint corpus exercises the coalesce-default path."""
    ratios = dsir.fit_log_ratio(corpus_df, "tgt")
    fresh = spark.createDataFrame(
        [(100, "zzzq qqxx wwvv")], ["doc_id", "text"]
    )
    row = dsir.score_importance(fresh, ratios).collect()[0]
    t_n: dict[int, int] = {}
    r_n: dict[int, int] = {}
    for _, text, tgt in _CORPUS:
        for g in _grams(text):
            b = _h(g) % B
            r_n[b] = r_n.get(b, 0) + 1
            if tgt:
                t_n[b] = t_n.get(b, 0) + 1
    T, R = sum(t_n.values()), sum(r_n.values())
    ratio = {
        b: round(
            1e6
            * (
                math.log(t_n.get(b, 0) + 1)
                - math.log(T + B)
                - math.log(r_n[b] + 1)
                + math.log(R + B)
            )
        )
        for b in r_n
    }
    default = round(1e6 * (math.log(R + B) - math.log(T + B)))
    expected = sum(
        ratio.get(_h(g) % B, default) for g in _grams("zzzq qqxx wwvv")
    )
    assert row.logw_micro == expected
    # at least one of the made-up grams must actually be unseen, or the
    # test exercises nothing
    assert any(_h(g) % B not in r_n for g in _grams("zzzq qqxx wwvv"))


def test_dsir_partition_invariance(spark, corpus_df):
    ratios = dsir.fit_log_ratio(corpus_df, "tgt")
    a = sorted(
        map(tuple, dsir.score_importance(corpus_df, ratios).collect())
    )
    b = sorted(
        map(
            tuple,
            dsir.score_importance(corpus_df.repartition(7), ratios).collect(),
        )
    )
    assert a == b


def test_gumbel_topk_matches_bruteforce(spark, corpus_df):
    ratios = dsir.fit_log_ratio(corpus_df, "tgt")
    scores = dsir.score_importance(corpus_df, ratios)
    got = [(r.doc_id, r.key_micro) for r in dsir.gumbel_topk(scores, 3).collect()]
    py = _py_dsir_scores(_CORPUS)
    keys = []
    for i, (_, lw) in py.items():
        u = (_h(f"dsir|{i}") + 0.5) / float(1 << 60)
        g = round(-1e6 * math.log(-math.log(u)))
        keys.append((i, lw + g))
    keys.sort(key=lambda t: (-t[1], t[0]))
    assert got == keys[:3]


def test_gumbel_topk_k_exceeds_n(spark, corpus_df):
    ratios = dsir.fit_log_ratio(corpus_df, "tgt")
    scores = dsir.score_importance(corpus_df, ratios)
    assert dsir.gumbel_topk(scores, 100).count() == len(_CORPUS)


# ---------------------------------------------------------------------------
# Winnowing
# ---------------------------------------------------------------------------

_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick brown fox naps quietly all afternoon"),
    (4, "short"),  # < k chars after normalization -> no grams
    (5, "abcdefghij"),  # 10 chars: 3 grams < w -> single fingerprint
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(_DOCS, ["doc_id", "text"])


def test_winnow_matches_bruteforce(spark, docs_df):
    got: dict[int, set] = {}
    for r in winnow.winnow_fingerprints(docs_df).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp_hash))
    for i, text in _DOCS:
        assert got.get(i, set()) == _py_winnow(text), f"doc {i}"


def test_winnow_short_doc_has_one_fingerprint(spark, docs_df):
    rows = winnow.winnow_fingerprints(
        docs_df.filter(F.col("doc_id") == 5)
    ).collect()
    assert len(rows) == 1


def test_winnow_partition_invariance(spark, docs_df):
    a = sorted(map(tuple, winnow.winnow_fingerprints(docs_df).collect()))
    b = sorted(
        map(tuple, winnow.winnow_fingerprints(docs_df.repartition(5)).collect())
    )
    assert a == b


def test_winnow_match_guarantee(spark):
    """Any shared substring of length >= k + w - 1 shares a fingerprint
    hash, wherever it sits in either document."""
    shared = "xyzzy plugh quux corge"  # 22 chars > k + w - 1 = 11
    docs = [
        (1, f"leading text before {shared} and trailing words here"),
        (2, f"{shared} starts this one instead"),
        (3, f"totally unrelated content with no overlap at all"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fps: dict[int, set] = {}
    for r in winnow.winnow_fingerprints(df).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp_hash)
    assert fps[1] & fps[2], "winnowing guarantee violated"


def test_winnow_profile_density(spark, docs_df):
    rows = {r.doc_id: r for r in winnow.winnow_profile(docs_df).collect()}
    assert 4 not in rows  # no grams -> excluded
    for i, text in _DOCS:
        if i == 4:
            continue
        py = _py_winnow(text)
        r = rows[i]
        assert r.n_fp == len(py)
        assert r.density_micro == 1_000_000 * len(py) // r.n_grams


def test_winnow_contamination_planted(spark):
    bench_text = "canary benchmark sentence that must be detected verbatim"
    docs = [
        (1, f"some training doc containing {bench_text} inside it"),
        (2, "a perfectly clean training document with original text"),
    ]
    corpus = spark.createDataFrame(docs, ["doc_id", "text"])
    bench = spark.createDataFrame([(90, bench_text)], ["doc_id", "text"])
    got = {
        r.doc_id: r for r in winnow.winnow_contamination(corpus, bench).collect()
    }
    assert got[1].n_hit > 0 and got[1].overlap_micro > 0
    assert got[2].n_hit == 0 and got[2].overlap_micro == 0


def test_doremi_mixture_step_semantics(spark):
    """Weights are a probability vector; every boost >= 1 (excess is
    clipped at 0); the off-distribution source is boosted ABOVE its
    size share, the in-distribution one toward/below it."""
    from diagnosisextraction_ml_spark.operators import lm
    from diagnosisextraction_ml_spark.operators.dsir import doremi_mixture_step

    indomain = "the cat sat on the mat and the dog ran to the rug " * 10
    offdomain = "zq xv qqj kpw zzv jxq wvq pzk qzz vxw kjq wqz " * 10
    rows = [(i, indomain, "en", "srcA") for i in range(6)]
    rows += [(100 + i, offdomain, "xx", "srcB") for i in range(6)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    tri, big, uni = lm.fit_trigram_counts(docs.filter(F.col("lang") == "en"))
    out = {r["source"]: r for r in doremi_mixture_step(docs, tri, big, uni).collect()}
    assert set(out) == {"srcA", "srcB"}
    total = sum(r["weight"] for r in out.values())
    assert abs(total - 1.0) < 1e-12
    assert all(r["boost_micro"] >= 1_000_000 for r in out.values())
    # equal sizes -> the EG step must shift weight toward the source
    # with the worse (more negative) LM score
    assert out["srcB"]["src_score"] < out["srcA"]["src_score"]
    assert out["srcB"]["weight"] > 0.5 > out["srcA"]["weight"]
    assert out["srcA"]["excess"] == 0.0  # above the corpus mean -> clipped
