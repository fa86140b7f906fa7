"""EP2 (MLlib CV harness) scale measurement — SURVEY §7's claim, measured.

SURVEY §7 flags tiny-data ML as driver-dominated and demands the
design still scale; until round 14 that claim had zero measurements
behind it. This tool replicates the reference's committed patient
cache (autocorrect_dummydata.csv, 668 patients) by an id-suffix factor
(gen_sf-style replication: PATNR gets a ``_<rep>`` suffix so CV fold
assignment still sees distinct keys) and times ONE representative
split (TF-IDF + NaiveBayes, round 0 / fold 0 — the harness runs 10 of
these, embarrassingly parallel under its thread pool) at each factor,
broken down by stage:

- ``featurize_fit``   — fitting the TF-IDF pipeline (tokenize →
  CountVectorizer vocabulary pass → IDF pass)
- ``featurize_apply`` — transforming + materializing train features
- ``model_fit``       — NaiveBayes over the materialized features
- ``score_curve``     — scoring the test fold + curve/AUC reduction

plus the end-to-end harness wall for the same single split. The
scale control is ``vocabSize``: CountVectorizer's fitted vocabulary
is a driver-side array (the one EP2 structure that grows with corpus
CONTENT rather than rows), capped at 2^18 by default —
tests/test_features.py pins the cap so corpus growth can't push an
unbounded vocabulary through the driver.

Usage: python tools/ep2_scale.py [factor ...]   (default: 1 10 100)
Prints a per-factor breakdown and one JSON line for PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

REFERENCE = "/root/reference/sample_data"


def replicate(df, factor: int):
    """gen_sf-style id-suffix replication: ``factor`` copies of every
    patient, each with a distinct PATNR (fold hashing treats them as
    distinct patients; text content is unchanged)."""
    from pyspark.sql import functions as F

    if factor == 1:
        return df
    reps = df.sparkSession.range(factor).select(F.col("id").alias("__rep"))
    return df.crossJoin(reps).withColumn(
        "PATNR", F.concat_ws("_", F.col("PATNR").cast("string"), "__rep")
    ).drop("__rep")


def time_split(spark, labeled, text_col="Text", label_col="label"):
    """One (round 0, fold 0) TF-IDF+NaiveBayes split, stage-timed."""
    from pyspark.ml.classification import NaiveBayes
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    from diagnosisextraction_ml_spark.operators.evaluate import (
        auc_rank,
        curve_by_threshold,
    )
    from diagnosisextraction_ml_spark.operators.prep import assign_folds
    from diagnosisextraction_ml_spark.plans.features import build_tfidf_pipeline

    t = {}
    folded = assign_folds(labeled, "PATNR", n_folds=2, rounds=1).persist()
    folded.count()
    train = folded.filter(F.col("fold_0") != 0)
    test = folded.filter(F.col("fold_0") == 0)

    t0 = time.time()
    feat_model = build_tfidf_pipeline(
        input_col=text_col, output_col="features"
    ).fit(train)
    t["featurize_fit"] = round(time.time() - t0, 2)

    t0 = time.time()
    train_feats = feat_model.transform(train).select("features", label_col).persist()
    n_train = train_feats.count()
    t["featurize_apply"] = round(time.time() - t0, 2)

    t0 = time.time()
    nb = NaiveBayes(
        featuresCol="features", labelCol=label_col, modelType="multinomial"
    ).fit(train_feats)
    t["model_fit"] = round(time.time() - t0, 2)

    t0 = time.time()
    scored = (
        nb.transform(feat_model.transform(test))
        .select(
            F.element_at(vector_to_array("probability"), 2).alias("score"),
            F.col(label_col).alias("label"),
        )
        .persist()
    )
    curve_by_threshold(scored, "score", "label").collect()
    auc = auc_rank(scored, "score", "label").collect()[0]["auc"]
    t["score_curve"] = round(time.time() - t0, 2)

    t["total"] = round(sum(v for k, v in t.items() if k != "total"), 2)
    t["n_train"] = n_train
    t["roc_auc"] = round(auc, 4)
    vocab = len(feat_model.stages[-3].vocabulary)  # CountVectorizerModel
    t["vocab_terms"] = vocab
    scored.unpersist()
    train_feats.unpersist()
    folded.unpersist()
    return t


def main() -> int:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]

    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.operators.prep import binarize_label
    from diagnosisextraction_ml_spark.sources.readers import read_patient_cache

    spark = get_spark(
        "ep2-scale",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = binarize_label(
        read_patient_cache(spark, f"{REFERENCE}/autocorrect_dummydata.csv"),
        "Outcome",
        "label",
    )

    out = {"metric": "ep2_scale", "factors": {}}
    for k in factors:
        corpus = replicate(base, k).persist()
        n = corpus.count()
        res = time_split(spark, corpus)
        res["n_patients"] = n
        out["factors"][str(k)] = res
        corpus.unpersist()
        print(
            f"factor {k:>4}: {n:>6} patients | "
            + " ".join(
                f"{s}={res[s]}s"
                for s in ("featurize_fit", "featurize_apply", "model_fit",
                          "score_curve", "total")
            )
            + f" | vocab={res['vocab_terms']} auc={res['roc_auc']}",
            flush=True,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
