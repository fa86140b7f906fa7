"""Model zoo (SURVEY.md §2.6 M1-M10) — uniform name → ml.Pipeline registry.

Every entry builds ``Pipeline([tfidf stages..., classifier, score])``
ending in a ``p1`` column = P(positive). Ref: the 8 sklearn pipelines
of notebook cells 38/40. Semantic mappings (documented differences):

- WordMatching (M1): rule regex → Transformer, no fitting
  (ref: CustomBinaryModel, src/TextClassification.py:32-75).
- NaiveBayes (M2): MLlib multinomial NB — NB needs non-negative
  feature values, so its pipeline skips the L2 normalizer sign issue
  (TF-IDF is non-negative; fine).
- GradientBoosting (M3) → GBTClassifier; trees can't take 2^18-dim
  sparse TF-IDF efficiently → hashed to 4096 dims (documented).
- NeuralNetworks (M4) → MultilayerPerceptronClassifier on hashed
  features (layer sizes must be static).
- DecisionTree (M5) → DecisionTreeClassifier (hashed dims, as M3).
- SVM (M6): LinearSVC + fitted Platt calibration on the raw margin
  (1-D weighted LR with Platt target smoothing — see
  :class:`PlattCalibrator`). Margin ordering is preserved, so
  ROC/PR-AUC match the uncalibrated path; probability values now track
  the train distribution like sklearn's probability=True
  (SURVEY §7 hard part #2).
- RandomForest (M7) → RandomForestClassifier (hashed dims).
- Dummy (M8): stratified coin flip at train prevalence — an Estimator
  that fits the prevalence, then a deterministic-hash coin.
- SGD/XGBoost (M9, legacy outputs) → LogisticRegression (elasticNet)
  and GBT already covered.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Estimator, Pipeline, Transformer
from pyspark.ml.classification import (
    DecisionTreeClassifier,
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    MultilayerPerceptronClassifier,
    NaiveBayes,
    RandomForestClassifier,
)
from pyspark.ml.functions import vector_to_array
from pyspark.ml.param.shared import Param, Params
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diagnosisextraction_ml_spark.functions.text import RA_TARGETS, word_match_expr
from diagnosisextraction_ml_spark.plans.features import build_tfidf_stages

SEED = 26062019  # ref: notebook cell 2


class ExtractScore(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """Append ``p1`` = P(class 1) from an MLlib probability vector."""

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn("p1", vector_to_array(F.col("probability")).getItem(1))


class MarginSigmoid(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """``p1`` = sigmoid(margin) from LinearSVC's rawPrediction.

    Order-preserving *uncalibrated* sigmoid — superseded by
    :class:`PlattCalibrator` in the SVM pipeline; kept for callers that
    want the fixed mapping.
    """

    def _transform(self, df: DataFrame) -> DataFrame:
        margin = vector_to_array(F.col("rawPrediction")).getItem(1)
        return df.withColumn("p1", F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)))


class PlattCalibrator(Estimator, DefaultParamsReadable, DefaultParamsWritable):
    """M6 — fitted Platt scaling on the LinearSVC margin.

    sklearn's ``SVC(probability=True)`` fits ``P(y=1|m) = σ(A·m + B)``
    on (margin, label) pairs (Platt 1999); ref
    src/TextClassification.py:603-606 relies on those probabilities and
    notebook cell 86 thresholds them at 0.68. This stage fits the same
    sigmoid as a 1-D logistic regression on the train-fold margins,
    with Platt's target smoothing — each point contributes a positive
    copy weighted ``t`` and a negative copy weighted ``1-t``, where
    ``t₊ = (N₊+1)/(N₊+2)`` and ``t₋ = 1/(N₋+2)`` — so the calibration
    problem is never separable and the unregularized fit cannot
    diverge even when the SVC separates its own train set.

    Documented difference from sklearn: Platt's targets come from
    internal 3-fold CV margins there; here they come from the train
    margins directly (one fit, no CV). The margin *ordering* is
    preserved either way, so ROC/PR-AUC are identical to the
    uncalibrated path — only probability values (and thus fixed
    thresholds like 0.68) move.
    """

    labelCol = Param(Params._dummy(), "labelCol", "label column name")

    @keyword_only
    def __init__(self, label_col: str = "label"):
        super().__init__()
        self._setDefault(labelCol="label")
        self._set(labelCol=label_col)

    def _fit(self, df: DataFrame) -> "PlattSigmoidModel":
        from pyspark.ml.functions import array_to_vector

        label_col = self.getOrDefault(self.labelCol)
        # sklearn never sees NULL targets — rows without a label must not
        # enter the calibration set (counting them via count(*) would
        # inflate n_neg and fit them as weighted negatives).
        df = df.filter(F.col(label_col).isNotNull())
        y = F.col(label_col).cast("double")
        margin = vector_to_array(F.col("rawPrediction")).getItem(1)
        counts = df.agg(
            F.sum(y).alias("n_pos"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        n_pos = float(counts["n_pos"] or 0.0)
        n_neg = float(counts["n"]) - n_pos
        t_pos = (n_pos + 1.0) / (n_pos + 2.0)
        t_neg = 1.0 / (n_neg + 2.0)
        t = F.when(y == 1.0, F.lit(t_pos)).otherwise(F.lit(t_neg))
        base = df.select(
            array_to_vector(F.array(margin)).alias("__m"), t.alias("__t")
        )
        cal = base.select(
            "__m", F.lit(1.0).alias("__y"), F.col("__t").alias("__w")
        ).unionByName(
            base.select("__m", F.lit(0.0).alias("__y"), (1.0 - F.col("__t")).alias("__w"))
        )
        lr = LogisticRegression(
            featuresCol="__m", labelCol="__y", weightCol="__w", maxIter=100, regParam=0.0
        )
        m = lr.fit(cal)
        return PlattSigmoidModel(a=float(m.coefficients[0]), b=float(m.intercept))


class PlattSigmoidModel(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """``p1`` = σ(a·margin + b) with fitted Platt coefficients."""

    a = Param(Params._dummy(), "a", "fitted sigmoid slope")
    b = Param(Params._dummy(), "b", "fitted sigmoid intercept")

    @keyword_only
    def __init__(self, a: float = 1.0, b: float = 0.0):
        super().__init__()
        self._setDefault(a=1.0, b=0.0)
        self._set(a=float(a), b=float(b))

    def _transform(self, df: DataFrame) -> DataFrame:
        a = self.getOrDefault(self.a)
        b = self.getOrDefault(self.b)
        margin = vector_to_array(F.col("rawPrediction")).getItem(1)
        z = F.lit(a) * margin + F.lit(b)
        return df.withColumn("p1", F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


class WordMatchModel(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    """M1 — rule-based word matching (no fitting).

    Ref: CustomBinaryModel.judgeEntry/predict
    (src/TextClassification.py:57-75); targets from notebook cell 36.
    """

    targets = Param(Params._dummy(), "targets", "match target phrases")
    inputCol = Param(Params._dummy(), "inputCol", "text column name")

    @keyword_only
    def __init__(self, targets: tuple[str, ...] = RA_TARGETS, input_col: str = "Text"):
        super().__init__()
        self._setDefault(targets=list(RA_TARGETS), inputCol="Text")
        self._set(targets=list(targets), inputCol=input_col)

    def _transform(self, df: DataFrame) -> DataFrame:
        hit = word_match_expr(
            F.lower(F.col(self.getOrDefault(self.inputCol))),
            tuple(self.getOrDefault(self.targets)),
        )
        return df.withColumn("p1", hit.cast("double")).withColumn(
            "prediction", hit.cast("double")
        )


class DummyStratified(Estimator, DefaultParamsReadable, DefaultParamsWritable):
    """M8 — sklearn DummyClassifier(strategy='stratified') equivalent.

    Fits the train prevalence; predicts positive with that probability
    via a deterministic md5 coin on ``keyCol`` (the engine's hashing
    doctrine — ``F.rand(seed)`` is partition-dependent, so the same
    row would flip differently on different cluster layouts).

    State lives in pyspark.ml Params (not plain attributes) so
    DefaultParamsWritable round-trips it — a loaded instance predicts
    identically to the saved one.
    """

    labelCol = Param(Params._dummy(), "labelCol", "label column name")
    keyCol = Param(Params._dummy(), "keyCol", "hash-coin key column name")
    seed = Param(Params._dummy(), "seed", "deterministic-coin seed")

    @keyword_only
    def __init__(self, label_col: str = "label", key_col: str = "Text", seed: int = SEED):
        super().__init__()
        self._setDefault(labelCol="label", keyCol="Text", seed=SEED)
        self._set(labelCol=label_col, keyCol=key_col, seed=seed)

    def _fit(self, df: DataFrame) -> "DummyStratifiedModel":
        label_col = self.getOrDefault(self.labelCol)
        prevalence = df.agg(F.avg(F.col(label_col).cast("double"))).collect()[0][0]
        return DummyStratifiedModel(
            prevalence=float(prevalence or 0.0),
            key_col=self.getOrDefault(self.keyCol),
            seed=self.getOrDefault(self.seed),
        )


class DummyStratifiedModel(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    prevalence = Param(Params._dummy(), "prevalence", "fitted positive prevalence")
    keyCol = Param(Params._dummy(), "keyCol", "hash-coin key column name")
    seed = Param(Params._dummy(), "seed", "deterministic-coin seed")

    @keyword_only
    def __init__(self, prevalence: float = 0.5, key_col: str = "Text", seed: int = SEED):
        super().__init__()
        self._setDefault(prevalence=0.5, keyCol="Text", seed=SEED)
        self._set(prevalence=float(prevalence), keyCol=key_col, seed=seed)

    def _transform(self, df: DataFrame) -> DataFrame:
        key_col = self.getOrDefault(self.keyCol)
        seed = self.getOrDefault(self.seed)
        prev = self.getOrDefault(self.prevalence)
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("§", F.col(key_col).cast("string"), F.lit(str(seed)))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        coin = ((h % 1_000_000) < F.lit(int(prev * 1_000_000))).cast("double")
        return df.withColumn("p1", coin).withColumn("prediction", coin)


def _hashed_features(dim: int):
    return dict(use_hashing=True, vocab_size=dim)


def build_model_pipeline(
    name: str,
    text_col: str = "Text",
    label_col: str = "label",
    **feature_overrides,
) -> Pipeline:
    """Build the full text→score pipeline for a registry model name."""
    fkw = dict(input_col=text_col, output_col="features")
    fkw.update(feature_overrides)

    def tfidf(**extra):
        kw = dict(fkw)
        kw.update(extra)
        return build_tfidf_stages(**kw)

    if name == "WordMatching":
        return Pipeline(stages=[WordMatchModel(input_col=text_col)])
    if name == "NaiveBayes":
        clf = NaiveBayes(
            modelType="multinomial", featuresCol="features", labelCol=label_col, smoothing=1.0
        )
        return Pipeline(stages=[*tfidf(), clf, ExtractScore()])
    if name == "GradientBoosting":
        clf = GBTClassifier(
            featuresCol="features", labelCol=label_col, seed=SEED, maxIter=50, maxDepth=3
        )
        return Pipeline(stages=[*tfidf(**_hashed_features(4096)), clf, ExtractScore()])
    if name == "NeuralNetworks":
        dim = 1024
        clf = MultilayerPerceptronClassifier(
            featuresCol="features",
            labelCol=label_col,
            layers=[dim, 32, 2],
            solver="l-bfgs",
            seed=SEED,
            maxIter=200,
        )
        return Pipeline(stages=[*tfidf(**_hashed_features(dim)), clf, ExtractScore()])
    if name == "DecisionTree":
        clf = DecisionTreeClassifier(featuresCol="features", labelCol=label_col, seed=SEED)
        return Pipeline(stages=[*tfidf(**_hashed_features(4096)), clf, ExtractScore()])
    if name == "SVM":
        clf = LinearSVC(featuresCol="features", labelCol=label_col, maxIter=100, regParam=0.01)
        return Pipeline(stages=[*tfidf(), clf, PlattCalibrator(label_col=label_col)])
    if name == "RandomForest":
        clf = RandomForestClassifier(
            featuresCol="features", labelCol=label_col, seed=SEED, numTrees=100
        )
        return Pipeline(stages=[*tfidf(**_hashed_features(4096)), clf, ExtractScore()])
    if name == "Dummy":
        return Pipeline(stages=[DummyStratified(label_col=label_col, key_col=text_col)])
    if name == "SGDClassifier":
        clf = LogisticRegression(
            featuresCol="features", labelCol=label_col, elasticNetParam=0.15, regParam=1e-4
        )
        return Pipeline(stages=[*tfidf(), clf, ExtractScore()])
    if name == "XGBoost":
        # M9: the reference trains xgboost.XGBClassifier (xgboost==0.90
        # pinned in ml_env.yml; output_files/predXGBoost.csv is its
        # prediction dump — ROC-AUC 0.976 on a separate n=1000 / 8.9%-
        # prevalence cohort whose inputs are not in the repo; on the
        # replayable EP2 cohort the reference's own boosted trees land
        # 0.902, so the golden gate compares against THAT matched
        # number — see tools/golden_report.py). Spark MLlib has no
        # XGBoost, so this is GBTClassifier with XGBoost-0.90-flavored
        # defaults (n_estimators=100, max_depth=3, learning_rate=0.1 →
        # maxIter/maxDepth/stepSize). Semantic difference, stated
        # plainly: MLlib GBT is first-order MART on logistic loss —
        # no second-order Hessian weighting, no L1/L2 leaf
        # regularization, no column subsampling — so per-row scores
        # differ from xgboost while cohort-level ROC-AUC lands within
        # the EP2 tolerance band (same stand-in doctrine as SVM/Platt).
        clf = GBTClassifier(
            featuresCol="features",
            labelCol=label_col,
            seed=SEED,
            maxIter=100,
            maxDepth=3,
            stepSize=0.1,
        )
        return Pipeline(stages=[*tfidf(**_hashed_features(4096)), clf, ExtractScore()])
    raise KeyError(f"unknown model {name!r} — known: {sorted(MODEL_REGISTRY)}")


MODEL_REGISTRY: tuple[str, ...] = (
    "WordMatching",
    "NaiveBayes",
    "GradientBoosting",
    "NeuralNetworks",
    "DecisionTree",
    "SVM",
    "RandomForest",
    "Dummy",
    "SGDClassifier",
    "XGBoost",
)
