"""CV harness (SURVEY.md §2.8 O1-O4, §2.7 E4-E6, E11) — the
``TextClassification``-class equivalent.

Ref: src/TextClassification.py — fitModels (:239-255), fitting
(:726-773), assessPerformance (:583-610), median-model selection
(:471-477), ttest_5x2cv (:1520-1574).

Orchestration stays on the driver (it is control flow, not data flow):
for each (model, round, fold) the harness launches distributed
fit/transform jobs, then collects only the per-fold *curves* (≤ a few
hundred points after tie-collapsing) and scalar AUCs. Row-level data
never reaches the driver. Fold membership is a deterministic hash
column (operators/prep.assign_folds), so a rerun on a different
cluster produces identical folds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diagnosisextraction_ml_spark.functions.stats import ttest_5x2cv
from diagnosisextraction_ml_spark.operators.evaluate import (
    auc_rank,
    auc_trapezoid,
    curve_by_threshold,
)
from diagnosisextraction_ml_spark.operators.prep import assign_folds
from diagnosisextraction_ml_spark.plans.models import build_model_pipeline

SEED = 26062019


@dataclass
class CVConfig:
    """O4 — the reference's getters/setters as one config object."""

    rounds: int = 5
    folds: int = 2
    key_col: str = "PATNR"
    text_col: str = "Text"
    label_col: str = "label"
    seed: int = SEED


@dataclass
class FoldResult:
    model: str
    round: int
    fold: int
    roc_auc: float
    pr_auc: float
    max_f1: float
    curve: list[dict] = field(repr=False, default_factory=list)
    # PR-AUC under the OPPOSITE tie convention (curve anchored at
    # recall=0, precision=1, the sklearn-style start). For probabilistic
    # scorers the two agree to ~1e-3; for hard 0/1 predictors the PR
    # "curve" is a step function and the two conventions bracket the
    # artifact range (WordMatching: 0.04 vs 0.99 around golden 0.988).
    pr_auc_anchored: float = 0.0


class TextClassificationHarness:
    """O1-O3 — fit the model zoo across CV splits, keep curves + models."""

    def __init__(self, df: DataFrame, models: list[str], config: CVConfig | None = None):
        self.config = config or CVConfig()
        self.models = models
        cfg = self.config
        self.df = assign_folds(df, cfg.key_col, n_folds=cfg.folds, rounds=cfg.rounds)
        self.results: dict[str, list[FoldResult]] = {m: [] for m in models}
        self.fitted: dict[tuple[str, int, int], object] = {}

    # -- O1 ----------------------------------------------------------------
    def fit_models(
        self, persist_models: bool = False, parallelism: int = 4
    ) -> dict[str, list[FoldResult]]:
        """Fit the zoo over every (model, round, fold) split.

        Splits are independent, so they run under a bounded thread pool
        (``parallelism`` concurrent Spark job chains — SURVEY §2.8 O1
        notes folds can run concurrently; on a big cluster sequential
        tiny fits leave the scheduler idle between jobs). Results are
        appended in the canonical nested-loop order regardless of
        completion order, and each task's lineage is identical to the
        sequential path — FoldResults are bit-identical for any
        ``parallelism`` (asserted in tests). ``parallelism=1`` recovers
        the plain loop.
        """
        cfg = self.config
        base = self.df.persist()
        tasks = [
            (name, r, f_idx)
            for name in self.models
            for r in range(cfg.rounds)
            for f_idx in range(cfg.folds)
        ]

        def run(task: tuple[str, int, int]):
            name, r, f_idx = task
            fold_col = f"fold_{r}"
            train = base.filter(F.col(fold_col) != f_idx)
            test = base.filter(F.col(fold_col) == f_idx)
            pipeline = build_model_pipeline(
                name, text_col=cfg.text_col, label_col=cfg.label_col
            )
            model = pipeline.fit(train)
            scored = model.transform(test).select(
                F.col("p1").alias("score"), F.col(cfg.label_col).alias("label")
            )
            return self._assess(name, r, f_idx, scored), model

        try:
            if parallelism <= 1:
                done = {t: run(t) for t in tasks}
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=min(parallelism, len(tasks))) as ex:
                    done = dict(zip(tasks, ex.map(run, tasks)))
            for task in tasks:
                res, model = done[task]
                self.results[task[0]].append(res)
                if persist_models:
                    self.fitted[task] = model
        finally:
            base.unpersist()
        return self.results

    # -- E2-E6 --------------------------------------------------------------
    def _assess(self, name: str, r: int, f_idx: int, scored: DataFrame) -> FoldResult:
        scored = scored.persist()
        try:
            curve = curve_by_threshold(scored, "score", "label")
            curve_rows = [row.asDict() for row in curve.collect()]
            roc = auc_rank(scored, "score", "label").collect()[0]["auc"]
            pr_pts = curve.select(
                F.col("tpr").alias("x"), F.col("precision").alias("y")
            )
            pr = auc_trapezoid(pr_pts, "x", "y", anchor_origin=False).collect()[0][
                "auc"
            ]
            # Opposite tie convention: prepend the (recall=0, precision=1)
            # anchor sklearn's precision_recall_curve adds, so hard-0/1
            # predictors report both ends of their step-function artifact.
            anchor = pr_pts.sparkSession.range(1).select(
                F.lit(0.0).alias("x"), F.lit(1.0).alias("y")
            )
            pr_anchored = auc_trapezoid(
                pr_pts.unionByName(anchor), "x", "y", anchor_origin=False
            ).collect()[0]["auc"]
            max_f1 = max((c["f1"] for c in curve_rows), default=0.0)
        finally:
            scored.unpersist()
        return FoldResult(
            model=name,
            round=r,
            fold=f_idx,
            roc_auc=float(roc or 0.0),
            pr_auc=float(pr or 0.0),
            max_f1=float(max_f1),
            curve=curve_rows,
            pr_auc_anchored=float(pr_anchored or 0.0),
        )

    # -- E4/E5 aggregation ---------------------------------------------------
    def summary(self) -> dict[str, dict[str, float]]:
        """Mean/std ROC-AUC, PR-AUC, max-F1 per model over all folds."""
        import statistics

        out = {}
        for name, results in self.results.items():
            if not results:
                continue
            rocs = [x.roc_auc for x in results]
            prs = [x.pr_auc for x in results]
            f1s = [x.max_f1 for x in results]
            out[name] = {
                "roc_auc_mean": statistics.mean(rocs),
                "roc_auc_std": statistics.pstdev(rocs),
                "pr_auc_mean": statistics.mean(prs),
                "pr_auc_std": statistics.pstdev(prs),
                "pr_auc_anchored_mean": statistics.mean(
                    [x.pr_auc_anchored for x in results]
                ),
                "f1_mean": statistics.mean(f1s),
                "f1_std": statistics.pstdev(f1s),
            }
        return out

    # -- E4 — fold curves interpolated onto a common grid ---------------------
    def roc_grid(self, name: str, n_points: int = 100):
        """E4 — per-fold ROC curves interpolated to a common FPR grid,
        with mean±std TPR per grid point.

        Ref: modelROC (src/TextClassification.py:402-429) — each fold's
        (fpr, tpr) interpolated onto ``linspace(0, 1, 100)``; the plot
        shows mean ± std. Curves are driver-sized (tie-collapsed), so
        numpy interp on the driver is the right altitude.

        Returns (grid, mean_tpr, std_tpr) as numpy arrays.
        """
        import numpy as np

        grid = np.linspace(0.0, 1.0, n_points)
        interped = []
        for res in self.results[name]:
            pts = sorted((c["fpr"], c["tpr"]) for c in res.curve)
            fpr = np.array([0.0] + [p[0] for p in pts])
            tpr = np.array([0.0] + [p[1] for p in pts])
            interped.append(np.interp(grid, fpr, tpr))
        stack = np.vstack(interped)
        return grid, stack.mean(axis=0), stack.std(axis=0)

    # -- E5 — fold PR curves interpolated onto a common recall grid -----------
    def pr_grid(self, name: str, n_points: int = 100):
        """E5 — per-fold precision interpolated to a common recall grid,
        with mean±std precision per grid point.

        Ref: plotPrecisionRecall (src/TextClassification.py:551-581) /
        plotPR (src/NLP_functions.py:716-745) — fold precisions onto
        ``recall_scale = linspace(0, 1, 100)``; the final grid point is
        pinned to 0.0 exactly as the reference's ``mean_precision[-1] =
        0.0`` does.

        Returns (grid, mean_precision, std_precision) as numpy arrays.
        """
        import numpy as np

        grid = np.linspace(0.0, 1.0, n_points)
        interped = []
        for res in self.results[name]:
            pts = sorted((c["tpr"], c["precision"]) for c in res.curve)
            rec = np.array([0.0] + [p[0] for p in pts])
            prec = np.array([1.0] + [p[1] for p in pts])
            interped.append(np.interp(grid, rec, prec))
        stack = np.vstack(interped)
        mean_p, std_p = stack.mean(axis=0), stack.std(axis=0)
        mean_p[-1] = 0.0
        return grid, mean_p, std_p

    # -- figure endpoints (driver-side rasterization) -------------------------
    def render_roc_figure(self, path: str | None = None, models: list[str] | None = None) -> bytes:
        """Render the mean-ROC ± std figure for the fitted models.

        Ref: the plotROC/plotSTD figure the reference notebook shows
        (src/NLP_functions.py:680-750). Inputs are the ≤100-pt fold
        grids — strictly driver-side."""
        from diagnosisextraction_ml_spark.functions.figures import plot_roc_std

        s = self.summary()
        names = models or [n for n in self.results if self.results[n]]
        data = {
            n: (*self.roc_grid(n), s[n]["roc_auc_mean"], s[n]["roc_auc_std"])
            for n in names
        }
        return plot_roc_std(data, path)

    def render_pr_figure(self, path: str | None = None, models: list[str] | None = None) -> bytes:
        """Render the mean precision-recall ± std figure.

        Ref: plotPrecisionRecall (src/TextClassification.py:551-581)."""
        from diagnosisextraction_ml_spark.functions.figures import plot_precision_recall

        s = self.summary()
        names = models or [n for n in self.results if self.results[n]]
        data = {
            n: (*self.pr_grid(n), s[n]["pr_auc_mean"], s[n]["pr_auc_std"])
            for n in names
        }
        return plot_precision_recall(data, path)

    def render_cutoff_figure(
        self, name: str, path: str | None = None, max_points: int = 512
    ) -> bytes:
        """Render the sensitivity/specificity CutOffPlot for ``name``.

        Ref: optimalCutoff(plot=True) (src/NLP_functions.py:229-257) —
        the reference draws it for "the" trained model, which in this
        harness is the median-PR-AUC iteration (the same pick
        write_median_predictions ships). Needs
        ``fit_models(persist_models=True)``. The curve is the E2
        tie-collapsed table, thinned driver-side to ≤ ``max_points``.
        """
        from diagnosisextraction_ml_spark.functions.figures import plot_cutoff
        from diagnosisextraction_ml_spark.operators.evaluate import (
            curve_by_threshold,
            cutoff_plot_points,
        )

        med = self.median_iteration(name)
        model = self.fitted.get((name, med.round, med.fold))
        if model is None:
            raise ValueError("render_cutoff_figure needs fit_models(persist_models=True)")
        test = self.df.filter(F.col(f"fold_{med.round}") == med.fold)
        scored = model.transform(test).select(
            F.col("p1").alias("score"),
            F.col(self.config.label_col).alias("label"),
        )
        pts = cutoff_plot_points(
            curve_by_threshold(scored, "score", "label"), max_points=max_points
        )
        return plot_cutoff(pts, path, title=f"CUT-OFF — {name.upper()}")

    # -- E5/O3 median-model selection ----------------------------------------
    def median_iteration(self, name: str) -> FoldResult:
        """The fold with median PR-AUC — "the" trained model.

        Ref: modelPrecisionRecall median pick,
        src/TextClassification.py:471-477 (sort AUC list, take middle).
        """
        results = sorted(self.results[name], key=lambda x: x.pr_auc)
        return results[len(results) // 2]

    # -- S3/O3 — write the median iteration's predictions --------------------
    def write_median_predictions(self, name: str, path: str) -> "FoldResult":
        """Write PRED|TRUE for the median-PR-AUC iteration of ``name``.

        Ref: writePredictionsToFile for the median CV iteration
        (src/TextClassification.py:431-444, 471-477) — exactly how the
        committed ``output_files/pred*.csv`` golden files were made.
        Requires ``fit_models(persist_models=True)``.
        """
        from diagnosisextraction_ml_spark.sources.writers import write_predictions

        med = self.median_iteration(name)
        model = self.fitted.get((name, med.round, med.fold))
        if model is None:
            raise ValueError("write_median_predictions needs fit_models(persist_models=True)")
        cfg = self.config
        test = self.df.filter(F.col(f"fold_{med.round}") == med.fold)
        scored = model.transform(test).select(
            F.col("p1").alias("PRED"), F.col(cfg.label_col).alias("TRUE")
        )
        write_predictions(scored, path)
        return med

    # -- E11 -------------------------------------------------------------------
    def compare_5x2cv(self, model_a: str, model_b: str) -> tuple[float, float]:
        """Dietterich 5x2cv paired t-test on ROC-AUCs (ref NB cells 48-56)."""
        if self.config.rounds != 5 or self.config.folds != 2:
            raise ValueError("5x2cv test needs rounds=5, folds=2")
        order = lambda rs: [x.roc_auc for x in sorted(rs, key=lambda x: (x.round, x.fold))]
        return ttest_5x2cv(order(self.results[model_a]), order(self.results[model_b]))


# ---------------------------------------------------------------------------
# E12/V3 — low-prevalence robustness sweep
# ---------------------------------------------------------------------------

def prevalence_sweep(
    df: DataFrame,
    model_name: str,
    prevalences: list[float],
    config: CVConfig | None = None,
    seed: int = SEED,
) -> list[dict]:
    """E12 — ROC-AUC as the test prevalence drops.

    Ref: classifyOnLowerPrevalence (src/NLP_functions.py:260-308) —
    train once on a balanced split, then re-evaluate on test sets
    resampled to each target prevalence. Returns driver-side rows
    [{prevalence, roc_auc, n_test}]. Resampling uses seeded Spark
    sampling (robustness sweep, not an oracle path).
    """
    from diagnosisextraction_ml_spark.operators.prep import (
        resample_to_prevalence,
        split_train_test,
    )

    cfg = config or CVConfig()
    train, test = split_train_test(df, cfg.key_col, test_frac=0.5, salt=str(seed))
    model = build_model_pipeline(model_name, text_col=cfg.text_col, label_col=cfg.label_col).fit(train)
    out = []
    for p in prevalences:
        resampled = resample_to_prevalence(test, cfg.label_col, p, seed=seed)
        scored = model.transform(resampled).select(
            F.col("p1").alias("score"), F.col(cfg.label_col).alias("label")
        )
        n_test = scored.count()
        roc = auc_rank(scored, "score", "label").collect()[0]["auc"]
        out.append({"prevalence": p, "roc_auc": float(roc or 0.0), "n_test": n_test})
    return out


# ---------------------------------------------------------------------------
# V5 — learning-curve sweep over training-set sizes
# ---------------------------------------------------------------------------

def sample_size_sweep(
    df: DataFrame,
    model_name: str,
    sizes: list[int],
    config: CVConfig | None = None,
    seed: int = SEED,
) -> list[dict]:
    """V5/E13 — ROC-AUC vs training-set size (learning curve).

    Ref: sampleSizeROC/PR (src/NLP_functions.py:752-836),
    samplingCurveROC/PR (src/TextClassification.py:1021-1237). Each
    size takes a deterministic hash-ordered first-n subset of the
    train half and evaluates on the fixed test half.
    """
    from diagnosisextraction_ml_spark.operators.prep import (
        split_train_test,
        subset_first_n,
    )

    cfg = config or CVConfig()
    train, test = split_train_test(df, cfg.key_col, test_frac=0.5, salt=str(seed))
    out = []
    for n in sizes:
        sub = subset_first_n(train, cfg.key_col, n)
        model = build_model_pipeline(
            model_name, text_col=cfg.text_col, label_col=cfg.label_col
        ).fit(sub)
        scored = model.transform(test).select(
            F.col("p1").alias("score"), F.col(cfg.label_col).alias("label")
        )
        roc = auc_rank(scored, "score", "label").collect()[0]["auc"]
        out.append({"n_train": n, "roc_auc": float(roc or 0.0)})
    return out
