"""EP1/EP3 end-to-end pipelines + S4 model persistence.

EP1 (preprocess) is pinned exactly by test_stemmer.test_golden_cache_parity;
here: EP3 — train on the preprocessed corpus, preprocess + score the
independent gold set, classification report at the reference's 0.68
cut-off (notebook cells 76-86)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.functions.stemmer import stem_text_udf
from diagnosisextraction_ml_spark.functions.text import fix_xml_artefacts, simple_cleaning
from diagnosisextraction_ml_spark.operators.evaluate import auc_rank, classification_report
from diagnosisextraction_ml_spark.operators.prep import binarize_label, merge_on_column
from diagnosisextraction_ml_spark.plans.models import build_model_pipeline
from diagnosisextraction_ml_spark.sources.readers import (
    read_ehr_entries,
    read_patient_cache,
)


def _preprocess(spark, path):
    """EP1 — read ';' EHR entries → merge → clean → stem → label."""
    ehr = read_ehr_entries(spark, path)
    merged = merge_on_column(ehr)
    cleaned = merged.withColumn(
        "Text", stem_text_udf(simple_cleaning(fix_xml_artefacts(F.col("Text"))))
    )
    return cleaned.withColumn("label", F.col("Outcome").cast("int"))


@pytest.mark.slow
def test_ep3_gold_set_scoring(spark, reference_dir):
    train = binarize_label(
        read_patient_cache(spark, f"{reference_dir}/sample_data/autocorrect_dummydata.csv"),
        "Outcome",
        "label",
    )
    model = build_model_pipeline("SVM").fit(train)

    gold = _preprocess(spark, f"{reference_dir}/sample_data/dummydata_gold.csv")
    scored = model.transform(gold).select(
        F.col("p1").alias("score"), F.col("label").alias("label")
    )
    auc = auc_rank(scored).collect()[0]["auc"]
    assert auc > 0.9  # gold set drawn from the same dummy distribution

    rep = classification_report(scored, threshold=0.68).collect()[0]
    assert rep["tp"] + rep["fp"] + rep["fn"] + rep["tn"] == gold.count()
    assert rep["acc"] > 0.8


@pytest.mark.slow
def test_model_save_load_round_trip(spark, reference_dir, tmp_path):
    """S4 — PipelineModel.save/load preserves transform output."""
    train = binarize_label(
        read_patient_cache(spark, f"{reference_dir}/sample_data/autocorrect_dummydata.csv"),
        "Outcome",
        "label",
    ).limit(200)
    model = build_model_pipeline("NaiveBayes").fit(train)
    path = str(tmp_path / "nb_model")
    model.write().overwrite().save(path)

    from pyspark.ml import PipelineModel

    loaded = PipelineModel.load(path)
    a = sorted(
        (r["PATNR"], round(r["p1"], 9)) for r in model.transform(train).select("PATNR", "p1").collect()
    )
    b = sorted(
        (r["PATNR"], round(r["p1"], 9)) for r in loaded.transform(train).select("PATNR", "p1").collect()
    )
    assert a == b


@pytest.mark.slow
def test_param_models_save_load_round_trip(spark, reference_dir, tmp_path):
    """S4 — Dummy/WordMatching state (prevalence, key, targets) must
    survive save/load: their state lives in ml Params, not plain
    attributes, so DefaultParamsWritable actually serializes it."""
    from pyspark.ml import PipelineModel

    train = binarize_label(
        read_patient_cache(spark, f"{reference_dir}/sample_data/autocorrect_dummydata.csv"),
        "Outcome",
        "label",
    ).limit(200)
    for name in ("Dummy", "WordMatching"):
        model = build_model_pipeline(name).fit(train)
        path = str(tmp_path / f"{name}_model")
        model.write().overwrite().save(path)
        loaded = PipelineModel.load(path)
        a = sorted(
            (r["PATNR"], r["p1"]) for r in model.transform(train).select("PATNR", "p1").collect()
        )
        b = sorted(
            (r["PATNR"], r["p1"]) for r in loaded.transform(train).select("PATNR", "p1").collect()
        )
        assert a == b
    # the fitted prevalence itself must round-trip (not reset to the default)
    dummy = build_model_pipeline("Dummy").fit(train).stages[0]
    path = str(tmp_path / "dummy_stage")
    dummy.write().overwrite().save(path)
    from diagnosisextraction_ml_spark.plans.models import DummyStratifiedModel

    reloaded = DummyStratifiedModel.load(path)
    assert reloaded.getOrDefault(reloaded.prevalence) == dummy.getOrDefault(dummy.prevalence)
    assert reloaded.getOrDefault(reloaded.keyCol) == dummy.getOrDefault(dummy.keyCol)


@pytest.mark.slow
def test_platt_calibration_fits_and_round_trips(spark, reference_dir, tmp_path):
    """M6 — PlattCalibrator: fitted sigmoid moves probabilities off the
    fixed sigmoid(margin) mapping without changing the margin ordering
    (so AUC is invariant), and the fitted (a, b) survive save/load."""
    from pyspark.ml import PipelineModel

    from diagnosisextraction_ml_spark.plans.models import PlattSigmoidModel

    train = binarize_label(
        read_patient_cache(spark, f"{reference_dir}/sample_data/autocorrect_dummydata.csv"),
        "Outcome",
        "label",
    )
    model = build_model_pipeline("SVM").fit(train)
    platt = model.stages[-1]
    assert isinstance(platt, PlattSigmoidModel)
    a = platt.getOrDefault(platt.a)
    # positive slope: calibration preserves the margin ordering
    assert a > 0
    # a fitted slope, not the fixed stand-in's implicit a=1, b=0
    assert (a, platt.getOrDefault(platt.b)) != (1.0, 0.0)

    scored = model.transform(train).select(
        F.col("p1").alias("score"), F.col("label").alias("label")
    )
    auc = auc_rank(scored).collect()[0]["auc"]
    assert auc > 0.9

    path = str(tmp_path / "svm_platt")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    reloaded = loaded.stages[-1]
    assert reloaded.getOrDefault(reloaded.a) == pytest.approx(a)
    assert reloaded.getOrDefault(reloaded.b) == pytest.approx(platt.getOrDefault(platt.b))


def test_platt_calibrator_excludes_null_labels(spark):
    """M6 — rows with NULL labels must not enter the calibration set
    (sklearn never sees NULL targets): fitting with extra NULL-label
    rows yields the same (a, b) as fitting without them."""
    from pyspark.ml.functions import array_to_vector

    from diagnosisextraction_ml_spark.plans.models import PlattCalibrator

    rows = [(-2.0, 0), (-1.0, 0), (-0.5, 0), (0.5, 1), (1.0, 1), (2.0, 1)]
    base = spark.createDataFrame(rows, "m double, label int").select(
        array_to_vector(F.array(F.lit(0.0), F.col("m"))).alias("rawPrediction"),
        "label",
    )
    nulls = spark.createDataFrame(
        [(3.0, None), (-3.0, None)], "m double, label int"
    ).select(
        array_to_vector(F.array(F.lit(0.0), F.col("m"))).alias("rawPrediction"),
        "label",
    )
    clean = PlattCalibrator(label_col="label").fit(base)
    noisy = PlattCalibrator(label_col="label").fit(base.unionByName(nulls))
    assert noisy.getOrDefault(noisy.a) == pytest.approx(clean.getOrDefault(clean.a))
    assert noisy.getOrDefault(noisy.b) == pytest.approx(clean.getOrDefault(clean.b))
