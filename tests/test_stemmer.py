"""T4 — Dutch Snowball stemmer tests.

The strongest oracle is end-to-end: the reference repo commits its own
preprocessed corpus (sample_data/autocorrect_dummydata.csv — produced
by merge → clean → SnowballStemmer('dutch'), notebook cells 6-17), so
reproducing it from the raw dummydata.csv pins A1+T1+T2+T4 exactly.
That runs in test_golden_cache_parity (Spark, slower); the unit cases
here pin individual algorithm steps.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.functions.stemmer import stem_dutch, stem_text

# Step-targeted cases (published Snowball 'dutch' algorithm semantics).
CASES = [
    # step 1: en-removal + kk/dd/tt undouble
    ("katten", "kat"),
    ("bedden", "bed"),
    ("lopen", "lop"),
    # step 1: s-removal with valid s-ending
    ("lichamen", "licham"),
    # step 4: undouble vowel (CVVD)
    ("geen", "gen"),
    ("boom", "bom"),
    # step 3b: ig in R2 (R2 from *unadjusted* R1)
    ("overig", "over"),
    # step 2 + 3b lijk
    ("lichamelijk", "licham"),
    ("heerlijk", "heerlijk"),
    # heden -> heid (step 1)
    ("mogelijkheden", "mogelijk"),
    # accents folded on input, then step-2 e-removal after non-vowel
    ("café", "caf"),
    # short words untouched
    ("de", "de"),
    ("en", "en"),
    ("", ""),
]


@pytest.mark.parametrize("word,expected", CASES)
def test_stem_cases(word, expected):
    assert stem_dutch(word) == expected


def test_stem_text_preserves_shape():
    assert stem_text("katten en bedden") == "kat en bed"
    assert stem_text("") == ""
    assert stem_text(None) is None


def test_golden_cache_parity(spark, reference_dir):
    """Reproduce the reference's committed preprocessed corpus exactly.

    merge (A1) → artefact fix (T1) → simpleCleaning (T2) → stem (T4)
    must equal sample_data/autocorrect_dummydata.csv token-for-token
    per patient (order-insensitive: the reference concatenates entries
    in file order, we sort deterministically).
    """
    from diagnosisextraction_ml_spark.functions.stemmer import stem_text_udf
    from diagnosisextraction_ml_spark.functions.text import (
        fix_xml_artefacts,
        simple_cleaning,
    )
    from diagnosisextraction_ml_spark.operators.prep import merge_on_column
    from diagnosisextraction_ml_spark.sources.readers import (
        read_ehr_entries,
        read_patient_cache,
    )

    ehr = read_ehr_entries(spark, f"{reference_dir}/sample_data/dummydata.csv")
    merged = merge_on_column(ehr)
    stemmed = merged.withColumn(
        "stemmed", stem_text_udf(simple_cleaning(fix_xml_artefacts(F.col("Text"))))
    )
    cache = read_patient_cache(
        spark, f"{reference_dir}/sample_data/autocorrect_dummydata.csv"
    )
    mine = {r["PATNR"]: r["stemmed"] for r in stemmed.select("PATNR", "stemmed").collect()}
    ref = {r["PATNR"]: r["Text"] for r in cache.select("PATNR", "Text").collect()}
    assert set(mine) == set(ref)
    mismatches = [
        p for p in ref if Counter(mine[p].split()) != Counter(ref[p].split())
    ]
    assert mismatches == []


def test_frozen_stem_map_covers_corpus_and_matches_live_stemmer():
    """FIXED_STEM_MAP must (a) cover every whitespace token of every
    testdata documents table and (b) agree with the live Snowball-Dutch
    stemmer on each — the contract that lets the text_stemmed DuckDB
    twin replay the map while Spark runs the real UDF."""
    import os

    import duckdb

    from diagnosisextraction_ml_spark.functions.stemmer import stem_dutch
    from diagnosisextraction_ml_spark.plans.frozen_artifacts import FIXED_STEM_MAP

    con = duckdb.connect()
    toks: set[str] = set()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        for (w,) in con.execute(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) FROM '{path}'"
        ).fetchall():
            toks.add(w)
    assert toks, "no testdata found"
    missing = toks - set(FIXED_STEM_MAP)
    assert not missing, f"frozen map missing tokens: {sorted(missing)[:10]}"
    for w, s in FIXED_STEM_MAP.items():
        assert s == (stem_dutch(w) if w else w), (w, s)
