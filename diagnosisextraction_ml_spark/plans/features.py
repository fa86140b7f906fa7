"""Feature engineering (SURVEY.md §2.6 M0, M11-M13).

M0 — the TF-IDF 1–3-gram vectorizer. Ref:
``TfidfVectorizer(ngram_range=(1,3), stop_words=...)`` (notebook cell
38; src/TextClassification.py:264-269). Spark-first expression:

    RegexTokenizer → StopWordsRemover → NGram(1..3) → concat
    → CountVectorizer → IDF → Normalizer(p=2)

Parity notes (SURVEY §7 hard parts):
- sklearn's token pattern ``(?u)\\b\\w\\w+\\b`` drops 1-char tokens —
  RegexTokenizer below uses the same pattern (gaps=False).
- sklearn idf = ln((1+n)/(1+df)) + 1 (smoothed); MLlib idf =
  ln((1+n)/(1+df)) — a constant +1 per feature. With L2 row
  normalization downstream the two differ slightly in feature values,
  so model metrics match within tolerance, not bit-for-bit.
- sklearn L2-normalizes rows; Normalizer(p=2) matches.

Every stage is a distributed MLlib transformer over a DataFrame —
fitting CountVectorizer/IDF is one pass each; no driver-side vocab
loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Pipeline, Transformer
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    HashingTF,
    NGram,
    Normalizer,
    RegexTokenizer,
    SQLTransformer,
    StopWordsRemover,
)

from diagnosisextraction_ml_spark.functions.stopwords import DUTCH_STOPWORDS

SKLEARN_TOKEN_PATTERN = r"(?u)\b\w\w+\b"


def build_tfidf_stages(
    input_col: str = "Text",
    output_col: str = "features",
    ngram_range: tuple[int, int] = (1, 3),
    stopwords: Sequence[str] | None = DUTCH_STOPWORDS,
    vocab_size: int = 1 << 18,
    min_df: float = 1.0,
    use_hashing: bool = False,
) -> list[Transformer]:
    """M0 — MLlib stages computing sklearn-style TF-IDF n-gram features.

    ``use_hashing=True`` swaps CountVectorizer for HashingTF — no
    fitted vocabulary, no extra pass, the right call at 100 TB when
    feature *names* aren't needed (feature introspection M13 needs the
    CountVectorizer vocabulary, so parity paths keep it).
    """
    lo, hi = ngram_range
    stages: list[Transformer] = [
        RegexTokenizer(
            inputCol=input_col,
            outputCol="__tokens",
            pattern=SKLEARN_TOKEN_PATTERN,
            gaps=False,
            toLowercase=True,
        )
    ]
    tok_col = "__tokens"
    if stopwords is not None:
        stages.append(
            StopWordsRemover(
                inputCol=tok_col, outputCol="__tokens_sw", stopWords=list(stopwords)
            )
        )
        tok_col = "__tokens_sw"

    gram_cols: list[str] = []
    for n in range(lo, hi + 1):
        if n == 1:
            gram_cols.append(tok_col)
            continue
        col = f"__grams_{n}"
        stages.append(NGram(n=n, inputCol=tok_col, outputCol=col))
        gram_cols.append(col)
    all_grams = "__all_grams"
    concat_sql = (
        "SELECT *, concat(" + ", ".join(gram_cols) + f") AS {all_grams} FROM __THIS__"
    )
    stages.append(SQLTransformer(statement=concat_sql))

    if use_hashing:
        stages.append(HashingTF(inputCol=all_grams, outputCol="__tf", numFeatures=vocab_size))
    else:
        stages.append(
            CountVectorizer(
                inputCol=all_grams, outputCol="__tf", vocabSize=vocab_size, minDF=min_df
            )
        )
    stages.append(IDF(inputCol="__tf", outputCol="__tfidf"))
    stages.append(Normalizer(inputCol="__tfidf", outputCol=output_col, p=2.0))
    return stages


def build_tfidf_pipeline(**kwargs) -> Pipeline:
    return Pipeline(stages=build_tfidf_stages(**kwargs))


def vocabulary_of(pipeline_model) -> list[str]:
    """M13 helper — the fitted CountVectorizer vocabulary (term names)."""
    from pyspark.ml.feature import CountVectorizerModel

    for stage in pipeline_model.stages:
        if isinstance(stage, CountVectorizerModel):
            return list(stage.vocabulary)
    raise ValueError("pipeline has no CountVectorizerModel (HashingTF path has no vocabulary)")
