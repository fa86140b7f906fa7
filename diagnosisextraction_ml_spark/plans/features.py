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


# ---------------------------------------------------------------------------
# M11 — χ² feature scoring
# ---------------------------------------------------------------------------

def chi_squared_features(df, features_col: str = "features", label_col: str = "label"):
    """M11 — per-feature χ² statistic vs the label.

    Ref: plotFeatureChiSquared (src/NLP_functions.py:390-426) —
    sklearn ``chi2(x_tfidf, y)``. Spark: ``ml.stat.ChiSquareTest``
    with ``flatten=True`` → one row per feature
    (featureIndex, pValue, degreesOfFreedom, statistic). The test is
    one distributed aggregation over the vector column; the result is
    vocab-sized, not data-sized.
    """
    from pyspark.ml.stat import ChiSquareTest

    return ChiSquareTest.test(df, features_col, label_col, flatten=True)


def top_chi_squared_terms(df, vocabulary: Sequence[str], k: int = 20,
                          features_col: str = "features", label_col: str = "label"):
    """M11 — top-k terms by χ² statistic, joined with the vocabulary."""
    import pyspark.sql.functions as F

    res = chi_squared_features(df, features_col, label_col)
    spark = df.sparkSession
    vocab_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(vocabulary)], "featureIndex int, term string"
    )
    return (
        res.join(F.broadcast(vocab_df), "featureIndex")
        .select("term", "statistic", "pValue")
        .orderBy(F.col("statistic").desc(), F.col("term").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# M12 — Pearson feature–label correlation
# ---------------------------------------------------------------------------

def feature_label_correlation(df, features_col: str = "features", label_col: str = "label"):
    """M12 — Pearson r between every feature column and the label.

    Ref: plotFeatureCorrelation (src/NLP_functions.py:428-463)
    (yellowbrick, dense pandas). Distributed form: everything reduces
    to per-feature sums — Summarizer gives sum(x) / sum(x²) (via
    normL2²) / sum(label·x) (via weightCol) in single passes over the
    vector column; only dim-sized vectors reach the driver.

    Returns a driver-side numpy array of r per feature (NaN where a
    feature is constant).
    """
    import numpy as np
    import pyspark.sql.functions as F
    from pyspark.ml.stat import Summarizer

    lbl = F.col(label_col).cast("double")
    n = df.count()
    row = df.select(
        Summarizer.sum(F.col(features_col)).alias("sum_x"),
        Summarizer.normL2(F.col(features_col)).alias("l2_x"),
        F.sum(lbl).alias("sum_y"),
        F.sum(lbl * lbl).alias("sum_y2"),
    ).collect()[0]
    wsum = (
        df.withColumn("__w", lbl)
        .select(Summarizer.sum(F.col(features_col), F.col("__w")).alias("sum_xy"))
        .collect()[0]["sum_xy"]
    )
    sum_x = np.asarray(row["sum_x"].toArray(), dtype=np.float64)
    sum_x2 = np.asarray(row["l2_x"].toArray(), dtype=np.float64) ** 2
    sum_xy = np.asarray(wsum.toArray(), dtype=np.float64)
    sum_y, sum_y2 = float(row["sum_y"]), float(row["sum_y2"])
    cov = sum_xy - sum_x * sum_y / n
    var_x = sum_x2 - sum_x**2 / n
    var_y = sum_y2 - sum_y**2 / n
    with np.errstate(invalid="ignore", divide="ignore"):
        return cov / np.sqrt(var_x * var_y)


# ---------------------------------------------------------------------------
# A4 — TF-IDF column sums (top features by total weight)
# ---------------------------------------------------------------------------

def tfidf_column_sums(df, vocabulary: Sequence[str] | None = None, k: int = 20,
                      features_col: str = "features"):
    """A4 — per-feature column sums of the TF-IDF matrix, top-k.

    Ref: src/NLP_functions.py:453,499,561 (``x.sum(axis=0)`` on the
    CSR matrix). Spark: ``Summarizer.sum`` tree-aggregates one
    vocab-sized vector — no exploded shuffle, one pass.

    Returns a DataFrame (term, weight) sorted desc with a name
    tie-break.
    """
    import pyspark.sql.functions as F
    from pyspark.ml.stat import Summarizer

    s = df.select(Summarizer.sum(F.col(features_col)).alias("s")).collect()[0]["s"]
    arr = s.toArray()
    names = list(vocabulary) if vocabulary is not None else [str(i) for i in range(len(arr))]
    pairs = [(names[i], float(v)) for i, v in enumerate(arr)]
    spark = df.sparkSession
    out = spark.createDataFrame(pairs, "term string, weight double")
    return out.orderBy(F.col("weight").desc(), F.col("term").asc()).limit(k)


# ---------------------------------------------------------------------------
# M13 — coefficient / importance extraction
# ---------------------------------------------------------------------------

def model_coefficients(pipeline_model, vocabulary: Sequence[str] | None = None, k: int = 20):
    """M13 — top-k (term, weight) from the fitted classifier stage.

    Ref: plot_coefficients (src/TextClassification.py:1243-1299) —
    handles ``coef_`` (linear) and ``feature_importances_`` (trees).
    Spark twins: ``.coefficients`` / ``.featureImportances``. Returns
    (top_positive, top_negative) lists of (term, weight); for tree
    importances top_negative is empty.
    """
    clf = None
    for stage in pipeline_model.stages:
        if hasattr(stage, "coefficients") or hasattr(stage, "featureImportances"):
            clf = stage
    if clf is None:
        raise ValueError("no classifier stage with coefficients/featureImportances")
    if hasattr(clf, "coefficients"):
        weights = clf.coefficients.toArray()
        signed = True
    else:
        weights = clf.featureImportances.toArray()
        signed = False
    names = (
        list(vocabulary) if vocabulary is not None else [str(i) for i in range(len(weights))]
    )
    order = sorted(range(len(weights)), key=lambda i: (-weights[i], names[i]))
    top_pos = [(names[i], float(weights[i])) for i in order[:k]]
    if not signed:
        return top_pos, []
    top_neg = [(names[i], float(weights[i])) for i in reversed(order[-k:])]
    return top_pos, top_neg
