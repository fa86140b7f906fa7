"""Bigram LM scoring — closed-form counts, exact micro-nat arithmetic."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from diagnosisextraction_ml_spark.operators import lm
from diagnosisextraction_ml_spark.operators.lm import (
    fit_bigram_counts,
    score_bigram_logprob,
)


def _corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran to the mat"),
        (2, "the dog sat on the rug"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scores_match_hand_computed_bigram_model(spark):
    """lp_sum equals the sum of round(1e6·(ln(C(w1,w2)+1) − ln(C(w1)+B)))
    computed by hand from raw bigram counts (B large → no collisions)."""
    B = 1 << 20
    df = _corpus(spark)
    bigrams, unigrams = fit_bigram_counts(df, n_buckets=B)
    scored = {
        r["doc_id"]: r for r in score_bigram_logprob(df, bigrams, unigrams, n_buckets=B).collect()
    }

    texts = {r["doc_id"]: r["text"].split() for r in df.collect()}
    cb: dict[tuple[str, str], int] = {}
    cu: dict[str, int] = {}
    for toks in texts.values():
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
            cu[a] = cu.get(a, 0) + 1
    for doc_id, toks in texts.items():
        want = sum(
            round(1e6 * (math.log(cb[(a, b)] + 1) - math.log(cu[a] + B)))
            for a, b in zip(toks, toks[1:])
        )
        assert scored[doc_id]["lp_sum"] == want
        assert scored[doc_id]["n_bigrams"] == len(toks) - 1
        assert scored[doc_id]["score"] == want / (1e6 * (len(toks) - 1))


def test_unseen_bigrams_fall_back_not_drop(spark):
    B = 1 << 20
    train = _corpus(spark)
    bigrams, unigrams = fit_bigram_counts(train, n_buckets=B)
    new = spark.createDataFrame(
        [(9, "the cat sat quietly"), (10, "zz qq ww")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in score_bigram_logprob(new, bigrams, unigrams, n_buckets=B).collect()}
    # both docs scored; the in-domain one scores higher
    assert set(out) == {9, 10}
    assert out[9]["score"] > out[10]["score"]
    # fully-unseen doc: every bigram contributes round(1e6·(ln(1)−ln(B)))
    assert out[10]["lp_sum"] == 2 * round(1e6 * (0.0 - math.log(B)))


def test_min_count_prunes_but_scoring_still_total(spark):
    df = _corpus(spark)
    bigrams, unigrams = fit_bigram_counts(df, n_buckets=1 << 20, min_count=2)
    # only bigrams seen ≥2 times survive the broadcast table
    assert all(r["c_bigram"] >= 2 for r in bigrams.collect())
    scored = score_bigram_logprob(df, bigrams, unigrams, n_buckets=1 << 20)
    assert scored.count() == 3  # every doc still gets a score


def test_scoring_is_partitioning_invariant(spark, sf_dir):
    from diagnosisextraction_ml_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(150)
    bigrams, unigrams = fit_bigram_counts(docs.filter(F.col("lang") == "en"))
    a = sorted(map(tuple, score_bigram_logprob(docs, bigrams, unigrams).collect()))
    b = sorted(
        map(tuple, score_bigram_logprob(docs.repartition(9), bigrams, unigrams).collect())
    )
    assert a == b


def test_reference_language_scores_higher(spark, sf_dir):
    """Perplexity separation: English documents (the training corpus)
    get higher mean log-prob than other languages."""
    from diagnosisextraction_ml_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    bigrams, unigrams = fit_bigram_counts(docs.filter(F.col("lang") == "en"))
    scored = score_bigram_logprob(docs, bigrams, unigrams).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r["en"]: r["m"]
        for r in scored.groupBy((F.col("lang") == "en").alias("en"))
        .agg(F.avg("score").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


# ---------------------------------------------------------------------------
# Interpolated trigram LM
# ---------------------------------------------------------------------------


def _py_trigram_score(train_texts, score_text, n_buckets=lm.DEFAULT_BUCKETS):
    """Independent dict-based model replaying the same bucketed JM mix."""
    import hashlib
    import math

    def bkt(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % n_buckets

    uni, big, tri = {}, {}, {}
    n_total = 0
    for txt in train_texts:
        ws = [bkt(w) for w in txt.lower().split()]
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
            n_total += 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
    ws = [bkt(w) for w in score_text.lower().split()]
    lp_sum, n_tri = 0, 0
    for a, b, c in zip(ws, ws[1:], ws[2:]):
        t3 = tri.get((a, b, c), 0) / big[(a, b)] if big.get((a, b)) else 0.0
        t2 = big.get((b, c), 0) / uni[b] if uni.get(b) else 0.0
        t1 = (uni.get(c, 0) + 1.0) / (n_total + n_buckets)
        p = lm.JM_L3 * t3 + lm.JM_L2 * t2 + lm.JM_L1 * t1
        lp_sum += round(1e6 * math.log(p))
        n_tri += 1
    return n_tri, lp_sum


def test_trigram_matches_python_model(spark):
    train = [
        "the cat sat on the mat",
        "the cat ran on the mat",
        "a dog sat on a log",
    ]
    probe = "the cat sat on a log please"
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string"
    )
    pdf = spark.createDataFrame([(99, probe)], "doc_id long, text string")
    tri, big, uni = lm.fit_trigram_counts(tdf)
    got = lm.score_trigram_interp(pdf, tri, big, uni).collect()[0]
    n_tri, lp_sum = _py_trigram_score(train, probe)
    assert (got.n_trigrams, got.lp_sum) == (n_tri, lp_sum)


def test_trigram_prefers_in_domain_text(spark):
    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "zzz qqq www eee rrr"),
        ],
        "doc_id long, text string",
    )
    tri, big, uni = lm.fit_trigram_counts(train)
    scores = {
        r.doc_id: r.score
        for r in lm.score_trigram_interp(probe, tri, big, uni).collect()
    }
    assert scores[1] > scores[2]


def test_trigram_short_docs_drop_out(spark):
    train = spark.createDataFrame(
        [(0, "a b c d e")], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, None), (4, "a b c")],
        "doc_id long, text string",
    )
    tri, big, uni = lm.fit_trigram_counts(train)
    got = {r.doc_id for r in lm.score_trigram_interp(probe, tri, big, uni).collect()}
    assert got == {4}


def test_carry_cols_equals_join_back(spark, sf_dir):
    """carry_cols rides a per-doc attribute through the scoring pass;
    the result must be row-identical to scoring and joining the
    attribute back by id (both scorers — r16 ccnet scan removal)."""
    from diagnosisextraction_ml_spark.sources.readers import load_table
    from diagnosisextraction_ml_spark.operators import lm

    docs = load_table(spark, sf_dir, "documents").limit(200)
    bigrams, unigrams = fit_bigram_counts(docs.filter(F.col("lang") == "en"))
    carried = lm.score_bigram_logprob(docs, bigrams, unigrams, carry_cols=("lang",))
    joined = score_bigram_logprob(docs, bigrams, unigrams).join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select("doc_id", "lang", "n_bigrams", "lp_sum", "score")
    assert carried.columns == ["doc_id", "lang", "n_bigrams", "lp_sum", "score"]
    assert carried.exceptAll(joined).count() == 0
    assert joined.exceptAll(carried).count() == 0

    tri, big, uni = lm.fit_trigram_counts(docs.filter(F.col("lang") == "en"))
    carried3 = lm.score_trigram_interp(docs, tri, big, uni, carry_cols=("lang",))
    joined3 = lm.score_trigram_interp(docs, tri, big, uni).join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select("doc_id", "lang", "n_trigrams", "lp_sum", "score")
    assert carried3.exceptAll(joined3).count() == 0
    assert joined3.exceptAll(carried3).count() == 0
