"""Language-ID — discrimination on a real-signal fixture, edge cases.

The registry entry (langid_char_ngram) pins cross-engine exactness on
the synthetic corpus, whose text does NOT vary by lang; these tests
prove the classifier actually discriminates when the signal exists.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.operators import langid

# Three toy languages with disjoint character inventories — any
# competent char-trigram model must separate them perfectly.
_LANG_WORDS = {
    "aa": ["banana", "cabana", "naab", "anan", "nabab"],
    "zz": ["zyzzyx", "xyzzy", "yzyx", "zxzy", "wyxz"],
    "oo": ["moloko", "porto", "kolo", "odomo", "plomo"],
}


def _sentences(lang, n, start_id):
    words = _LANG_WORDS[lang]
    rows = []
    for i in range(n):
        picks = [words[(i + j * j) % len(words)] for j in range(6)]
        rows.append((start_id + i, " ".join(picks), lang))
    return rows


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    for k, lang in enumerate(_LANG_WORDS):
        rows += _sentences(lang, 30, 1000 * k)
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_langid_separates_distinct_languages(spark, labeled):
    train = labeled.filter(F.col("doc_id") % 3 != 0)
    test = labeled.filter(F.col("doc_id") % 3 == 0)
    model, base = langid.fit_langid(train)
    preds = langid.score_langid(test, model, base)
    joined = test.join(preds, ["doc_id"]).select("lang", "pred_lang").collect()
    assert len(joined) == test.count()
    acc = sum(r.lang == r.pred_lang for r in joined) / len(joined)
    assert acc == 1.0


def test_langid_empty_docs_drop_out(spark, labeled):
    model, base = langid.fit_langid(labeled)
    probe = spark.createDataFrame(
        [(1, "banana anan"), (2, ""), (3, None), (4, "zy")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_lang for r in
           langid.score_langid(probe, model, base).collect()}
    assert got == {1: "aa"}  # <3 chars / empty / null are unclassifiable


def test_langid_deterministic_across_partitionings(spark, labeled):
    model, base = langid.fit_langid(labeled.repartition(7))
    a = sorted(map(tuple, langid.score_langid(labeled, model, base).collect()))
    model2, base2 = langid.fit_langid(labeled.coalesce(1))
    b = sorted(
        map(tuple, langid.score_langid(labeled.repartition(13), model2, base2).collect())
    )
    assert a == b


def test_langid_model_is_bounded(spark, labeled):
    model, base = langid.fit_langid(labeled)
    assert base.count() == 3
    assert model.count() <= 3 * langid.LANGID_BUCKETS
    # deltas vs the unseen floor are non-negative by construction
    assert model.filter(F.col("adj_micro") < 0).count() == 0
