"""End-to-end demo: the reference notebook's three entry points on its
own sample data, as one script.

    python tools/run_ep_pipelines.py [output_dir]

EP1 — preprocess: read ';' EHR entries → per-patient merge → artefact
fix → cleaning → stemming → write the '|' patient cache.
EP2 — train & evaluate: 5x2cv over the model zoo subset, fold
aggregation, median-model predictions, 5x2cv t-test vs Word Matching.
EP3 — gold set: score the independent validation set with the trained
SVM, classification report at the notebook's 0.68 cut-off.

Prints one JSON with every headline metric (compare with BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

REFERENCE = "/root/reference/sample_data"


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ep_pipelines"

    import pyspark.sql.functions as F

    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.functions.stemmer import stem_text_udf
    from diagnosisextraction_ml_spark.functions.text import (
        fix_xml_artefacts,
        simple_cleaning,
    )
    from diagnosisextraction_ml_spark.operators.evaluate import (
        auc_rank,
        classification_report,
    )
    from diagnosisextraction_ml_spark.operators.prep import (
        binarize_label,
        merge_on_column,
        recode_label,
    )
    from diagnosisextraction_ml_spark.plans.harness import (
        CVConfig,
        TextClassificationHarness,
    )
    from diagnosisextraction_ml_spark.plans.models import build_model_pipeline
    from diagnosisextraction_ml_spark.sources.readers import read_ehr_entries
    from diagnosisextraction_ml_spark.sources.writers import write_pipe_csv

    # Folds are a few hundred rows: small shuffle-partition count keeps
    # the many tiny harness aggregations from drowning in task overhead.
    spark = get_spark("ep-pipelines", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {}

    # ---- EP1 ----------------------------------------------------------------
    ehr = read_ehr_entries(spark, f"{REFERENCE}/dummydata.csv")
    merged = recode_label(merge_on_column(ehr), src="Outcome", dst="Outcome")
    prepped = merged.withColumn(
        "Text", stem_text_udf(simple_cleaning(fix_xml_artefacts(F.col("Text"))))
    ).select("Text", "PATNR", "Outcome")
    write_pipe_csv(prepped, f"{out_dir}/patient_cache", single_file=True)
    labeled = binarize_label(prepped, "Outcome", "label").persist()
    report["ep1_patients"] = labeled.count()

    # ---- EP2 ----------------------------------------------------------------
    # EP_ROUNDS=5 reproduces the notebook's full 5x2cv (and enables the
    # 5x2cv t-test); the default 2x2 keeps the demo under a few minutes.
    rounds = int(os.environ.get("EP_ROUNDS", "2"))
    harness = TextClassificationHarness(
        labeled, ["WordMatching", "NaiveBayes", "SVM"], CVConfig(rounds=rounds, folds=2)
    )
    harness.fit_models(persist_models=True)
    report["ep2_summary"] = harness.summary()
    med = harness.write_median_predictions("SVM", f"{out_dir}/predSVM")
    report["ep2_median_svm"] = {"round": med.round, "fold": med.fold, "pr_auc": med.pr_auc}
    if rounds == 5:
        t, p = harness.compare_5x2cv("NaiveBayes", "WordMatching")
        report["ep2_ttest_nb_vs_wm"] = {"t": t, "p": p}

    # The notebook's figure cells: mean-ROC/PR ± std and F1 bars.
    from diagnosisextraction_ml_spark.functions.figures import plot_f1_scores

    os.makedirs(f"{out_dir}/figures", exist_ok=True)
    harness.render_roc_figure(f"{out_dir}/figures/roc.png")
    harness.render_pr_figure(f"{out_dir}/figures/pr.png")
    plot_f1_scores(harness.summary(), f"{out_dir}/figures/f1.png")
    report["ep2_figures"] = ["roc.png", "pr.png", "f1.png"]

    # ---- EP3 ----------------------------------------------------------------
    svm = build_model_pipeline("SVM").fit(labeled)
    gold_raw = read_ehr_entries(spark, f"{REFERENCE}/dummydata_gold.csv")
    gold = merge_on_column(gold_raw)
    gold = gold.withColumn(
        "Text", stem_text_udf(simple_cleaning(fix_xml_artefacts(F.col("Text"))))
    ).withColumn("label", F.col("Outcome").cast("int"))
    scored = svm.transform(gold).select(
        F.col("p1").alias("score"), F.col("label").alias("label")
    )
    report["ep3_gold_auc"] = float(auc_rank(scored).collect()[0]["auc"])
    rep = classification_report(scored, threshold=0.68).collect()[0]
    report["ep3_report_at_068"] = {
        k: (float(rep[k]) if rep[k] is not None else None)
        for k in ("tp", "fp", "fn", "tn", "tpr", "tnr", "ppv", "npv", "acc", "f1")
    }

    # Gold-set figures: confusion heatmap at the 0.68 cut + score swarm.
    from diagnosisextraction_ml_spark.functions.figures import (
        plot_confusion_matrix,
        plot_swarm,
    )
    from diagnosisextraction_ml_spark.operators.evaluate import (
        confusion_counts,
        swarm_points,
        threshold_predictions,
    )

    cm_rows = confusion_counts(
        threshold_predictions(scored, "score", 0.68), "label", "pred"
    ).collect()
    plot_confusion_matrix(cm_rows, f"{out_dir}/figures/confusion_gold.png")
    pts = swarm_points(scored, "score", "label", max_points=2000).collect()
    plot_swarm(pts, f"{out_dir}/figures/swarm_gold.png")
    report["ep3_figures"] = ["confusion_gold.png", "swarm_gold.png"]

    print(json.dumps(report, indent=2, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
