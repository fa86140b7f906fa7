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
    # threshold cut keeps boundary-count ties, so vocab_size can exceed
    # max_vocab by the tie width — but never undershoot it
    assert model["truncated"] is True and model["vocab_size"] >= 10


def test_max_vocab_exact_fit_not_flagged(spark):
    """A corpus whose vocab is exactly max_vocab must NOT be flagged
    truncated (the old len(rows)==max_vocab check false-positived)."""
    docs = spark.createDataFrame(
        [("a b c", 1), ("a b d", 2)], ["text", "doc_id"]
    )  # vocab = {a, b, c, d}
    model = learn_bpe(docs, n_merges=2, max_vocab=4)
    assert model["truncated"] is False and model["vocab_size"] == 4


def test_vocab_cutoff_threshold_semantics(spark):
    """The rank-K cut is a count threshold: all words tying the rank-K
    count are kept, words strictly below are dropped."""
    from pyspark.sql import functions as F

    from diagnosisextraction_ml_spark.functions.bpe import (
        corpus_word_counts,
        vocab_count_cutoff,
    )

    # counts: a=4, b=3, c=3, d=3, e=1
    text = " ".join(["a"] * 4 + ["b", "c", "d"] * 3 + ["e"])
    docs = spark.createDataFrame([(text,)], ["text"])
    wc = corpus_word_counts(docs, "text")
    cutoff, truncated = vocab_count_cutoff(wc, 2)
    assert cutoff == 3 and truncated is True  # rank-2 count is 3
    kept = {r["word"] for r in corpus_word_counts(docs, "text", max_vocab=2).collect()}
    assert kept == {"a", "b", "c", "d"}  # boundary ties all kept; e dropped
    # no global top-K in the plan
    plan = corpus_word_counts(docs, "text", max_vocab=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan


def _naive_learn_bpe(word_counts, n_merges):
    """The textbook O(vocab·merges) full-rescan loop — kept here as the
    equivalence oracle for the incremental trainer."""
    vocab = {}
    for w, c in word_counts.items():
        if w:
            chars = list(w)
            chars[-1] = chars[-1] + EOW
            sym = tuple(chars)
            vocab[sym] = vocab.get(sym, 0) + int(c)
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def test_incremental_matches_naive_on_random_vocabs():
    """Property check: the incremental heap trainer is byte-identical
    to the full-rescan loop on seeded random vocabularies."""
    import random

    rng = random.Random(1729)
    alphabet = "abcdef"
    for trial in range(20):
        counts = {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))): rng.randint(1, 50)
            for _ in range(rng.randint(5, 60))
        }
        n = rng.randint(1, 40)
        assert learn_bpe_from_counts(counts, n) == _naive_learn_bpe(counts, n), (
            trial,
            counts,
        )


def test_incremental_trainer_is_fast():
    """≥2,000 merges over a 50k-word vocabulary in seconds.

    (The synthetic sf0.01 documents table has only ~31 distinct words —
    93 merges exhausts it — so the scale stress uses a seeded random
    Zipf-ish vocab. The O(vocab·merges) full-rescan loop took minutes
    at this shape; the incremental trainer must stay in seconds.)
    """
    import random
    import time

    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    counts = {}
    for i in range(50_000):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 12)))
        counts[w] = counts.get(w, 0) + max(1, int(50_000 / (i + 1)))
    t0 = time.monotonic()
    merges = learn_bpe_from_counts(counts, 2000)
    wall = time.monotonic() - t0
    assert len(merges) >= 2000
    assert wall < 60.0, f"incremental trainer took {wall:.1f}s for 2k merges"
