"""BPE tokenizer — classic merge learning + distributed application."""

from __future__ import annotations

from diagnosisextraction_ml_spark.functions.bpe import (
    EOW,
    apply_bpe_word,
    learn_bpe,
    learn_bpe_from_counts,
)


def test_learn_bpe_textbook_example():
    """The Sennrich et al. example: {'low':5, 'lower':2, 'newest':6,
    'widest':3} — the first merges build 'est</w>' from the most
    frequent pair (e,s → es, count 9)."""
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe_from_counts(counts, 4)
    assert merges[0] == ("e", "s")          # 9 occurrences
    assert merges[1] == ("es", f"t{EOW}")   # newest/widest endings
    # replaying merges tokenizes a training word consistently
    ranks = {p: i for i, p in enumerate(merges)}
    toks = apply_bpe_word("newest", ranks)
    assert "".join(toks) == "newest" + EOW  # lossless concatenation


def test_apply_bpe_round_trip_any_word():
    counts = {"abab": 4, "abc": 3, "banana": 2}
    merges = learn_bpe_from_counts(counts, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["abab", "abc", "banana", "unseen", "x", ""]:
        toks = apply_bpe_word(w, ranks)
        assert "".join(toks) == (w + EOW if w else "")


def test_learning_is_deterministic():
    counts = {"aa": 2, "ab": 2, "ba": 2}  # tied pair counts
    m1 = learn_bpe_from_counts(counts, 3)
    m2 = learn_bpe_from_counts(dict(reversed(list(counts.items()))), 3)
    assert m1 == m2  # lexicographic tie-break, not dict order


def test_no_merge_below_two_occurrences():
    merges = learn_bpe_from_counts({"abcdef": 1}, 10)
    assert merges == []  # every pair unique → nothing learned


def test_learn_and_apply_on_corpus(spark, sf_dir):
    import pyspark.sql.functions as F

    from diagnosisextraction_ml_spark.functions.bpe import (
        bpe_token_stats,
        bpe_tokenize_udf,
    )
    from diagnosisextraction_ml_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    model = learn_bpe(docs, n_merges=50)
    assert len(model["merges"]) > 0 and model["vocab_size"] > 0
    assert model["truncated"] is False

    # distributed application: concatenated tokens reconstruct the text
    tok = bpe_tokenize_udf(model["merges"])
    row = (
        docs.select("doc_id", "text", tok(F.col("text")).alias("toks"))
        .filter(F.length("text") > 0)
        .head()
    )
    rebuilt = "".join(row["toks"]).replace(EOW, " ").strip()
    want = " ".join(row["text"].lower().split())
    assert rebuilt == want

    # fertility: BPE never emits fewer than 1 token per word, and
    # merges make it less than raw characters
    stats = bpe_token_stats(docs, model["merges"]).collect()
    for r in stats:
        if r["n_ws_tokens"] > 0:
            assert r["n_bpe_tokens"] >= r["n_ws_tokens"]
            assert r["tokens_per_word"] >= 1.0

    # training is deterministic across input partitionings
    model2 = learn_bpe(docs.repartition(7), n_merges=50)
    assert model2["merges"] == model["merges"]


def test_max_vocab_truncation_is_flagged(spark, sf_dir):
    from diagnosisextraction_ml_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    model = learn_bpe(docs, n_merges=5, max_vocab=10)
    assert model["truncated"] is True and model["vocab_size"] == 10
