"""Boilerplate-sentence removal semantics."""

from __future__ import annotations

from diagnosisextraction_ml_spark.operators.dedup import remove_boilerplate_sentences

BP = "This legal disclaimer repeats on every page."


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_removed_uniques_kept(spark):
    rows = [
        (1, f"Unique opening one. {BP} Tail one."),
        (2, f"{BP} Unique body two!"),
        (3, f"Unique three? {BP}"),
        (4, "A document without any boilerplate at all."),
    ]
    out = {
        r["id"]: r
        for r in remove_boilerplate_sentences(
            _docs(spark, rows), min_doc_freq=3, min_chars=10
        ).collect()
    }
    assert out[1]["kept_text"] == "Unique opening one. Tail one."
    assert out[1]["n_sentences"] == 3 and out[1]["n_removed"] == 1
    assert out[2]["kept_text"] == "Unique body two!"
    assert out[3]["kept_text"] == "Unique three?"
    assert out[4]["n_removed"] == 0
    # unterminated tails still count as sentences (terminal '.' appended)
    rows5 = [(5, "No punctuation here at all")]
    out5 = remove_boilerplate_sentences(
        _docs(spark, rows5), min_doc_freq=3, min_chars=10
    ).collect()[0]
    assert out5["kept_text"] == "No punctuation here at all."
    assert out5["n_sentences"] == 1


def test_short_common_sentences_survive(spark):
    # "Yes." recurs everywhere but is under min_chars — never removed
    rows = [(i, f"Yes. Unique content number {i} right here.") for i in range(5)]
    out = remove_boilerplate_sentences(
        _docs(spark, rows), min_doc_freq=3, min_chars=10
    ).collect()
    assert all(r["kept_text"].startswith("Yes.") for r in out)
    assert all(r["n_removed"] == 0 for r in out)


def test_below_doc_freq_threshold_kept(spark):
    # shared by only 2 docs < min_doc_freq=3
    rows = [
        (1, f"{BP} Something else entirely."),
        (2, f"{BP} Another different thing."),
    ]
    out = remove_boilerplate_sentences(
        _docs(spark, rows), min_doc_freq=3, min_chars=10
    ).collect()
    assert all(r["n_removed"] == 0 for r in out)


def test_within_doc_repeat_counts_once(spark):
    # the same sentence 5x inside ONE doc is not corpus boilerplate
    rows = [
        (1, " ".join([BP] * 5)),
        (2, "Completely unrelated text over here."),
    ]
    out = {
        r["id"]: r
        for r in remove_boilerplate_sentences(
            _docs(spark, rows), min_doc_freq=2, min_chars=10
        ).collect()
    }
    assert out[1]["n_removed"] == 0 and out[1]["n_sentences"] == 5


def test_all_sentences_removed_gives_empty_text(spark):
    rows = [(i, BP) for i in range(4)]
    out = remove_boilerplate_sentences(
        _docs(spark, rows), min_doc_freq=3, min_chars=10
    ).collect()
    assert all(r["kept_text"] == "" and r["n_removed"] == 1 for r in out)
