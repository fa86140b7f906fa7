"""Figure rendering — reference plot parity (plotSTD/plotPR heatmap/swarm)
through the from-spec rasterizer + PNG codec, including a harness e2e
that writes a .png per figure family."""

from __future__ import annotations

import numpy as np
import pytest

from diagnosisextraction_ml_spark.functions.figures import (
    PALETTE,
    Canvas,
    _rgb,
    plot_confusion_matrix,
    plot_f1_scores,
    plot_feature_weights,
    plot_lexical_dispersion,
    plot_precision_recall,
    plot_roc_std,
    plot_swarm,
    plot_train_test_distribution,
    plot_word_frequencies,
    text_width,
)
from diagnosisextraction_ml_spark.functions.png import decode_png


def _roc_inputs():
    grid = np.linspace(0, 1, 100)
    return {
        "SVM": (grid, np.sqrt(grid), np.full(100, 0.05), 0.93, 0.02),
        "NaiveBayes": (grid, grid ** 0.3, np.full(100, 0.04), 0.88, 0.04),
    }


def test_roc_figure_decodes_and_is_deterministic(tmp_path):
    path = str(tmp_path / "roc.png")
    png1 = plot_roc_std(_roc_inputs(), path)
    png2 = plot_roc_std(_roc_inputs())
    assert png1 == png2  # byte-identical: no RNG anywhere
    assert open(path, "rb").read() == png1
    img = decode_png(png1)
    assert img.shape == (480, 640, 3)
    # both series colors and their ±std bands must be present
    flat = img.reshape(-1, 3)
    for slot in (0, 1):
        series = np.array(_rgb(PALETTE[slot]))
        assert (flat == series).all(axis=1).any(), f"series color {slot} missing"
        band = np.round(255 * 0.85 + series * 0.15)  # 0.15-alpha over white
        assert (flat == band).all(axis=1).any(), f"std band {slot} missing"


def test_pr_figure_decodes(tmp_path):
    grid = np.linspace(0, 1, 100)
    png = plot_precision_recall(
        {"SVM": (grid, 1 - 0.4 * grid, np.full(100, 0.03), 0.90, 0.03)},
        str(tmp_path / "pr.png"),
    )
    img = decode_png(png)
    assert img.shape == (480, 640, 3)
    assert (img.reshape(-1, 3) == np.array(_rgb(PALETTE[0]))).all(axis=1).any()


def test_confusion_heatmap_shading_and_ink():
    counts = [(0, 0, 412), (0, 1, 23), (1, 0, 17), (1, 1, 216)]
    img = decode_png(plot_confusion_matrix(counts))
    h, w, _ = img.shape
    # cell geometry from the module's fixed layout
    ml, mt, mr, mb = 120, 70, 30, 60
    cw, ch = (w - ml - mr) / 2, (h - mt - mb) / 2

    def cell_mean(i, j):
        y0, x0 = int(mt + i * ch), int(ml + j * cw)
        return img[y0 + 10 : y0 + 25, x0 + 10 : x0 + 25].mean()

    # shade is monotone in count: 412 darkest, 17 lightest
    means = {(i, j): cell_mean(i, j) for i in range(2) for j in range(2)}
    order = sorted(means, key=means.get)  # darkest first
    assert order[0] == (0, 0)  # 412
    assert means[(1, 0)] == max(means.values())  # 17 lightest
    # count text flips to white ink on the darkest cell
    y0, x0 = int(mt + 0 * ch), int(ml + 0 * cw)
    cell = img[y0 + 5 : y0 + int(ch) - 5, x0 + 5 : x0 + int(cw) - 5]
    assert (cell.reshape(-1, 3) == [255, 255, 255]).all(axis=1).any()
    # array input form is equivalent to row form
    assert plot_confusion_matrix([[412, 23], [17, 216]]) == plot_confusion_matrix(counts)


def test_swarm_is_deterministic_and_split_by_class():
    pts = [(i % 2, ((i * 37) % 100) / 100) for i in range(200)]
    png1 = plot_swarm(pts)
    assert png1 == plot_swarm(pts)
    img = decode_png(png1)
    flat = img.reshape(-1, 3)
    # class-0 and class-1 hues both present (alpha 0.8 over white)
    for slot in (0, 1):
        c = np.array(_rgb(PALETTE[slot]), float)
        blended = np.round(255 * 0.2 + c * 0.8)
        assert (flat == blended).all(axis=1).any()


def test_word_frequency_bars_scale_with_counts():
    words = [(f"woord{i}", 500 - i * 9) for i in range(20)]
    png = plot_word_frequencies(words)
    assert png == plot_word_frequencies(words)  # deterministic
    img = decode_png(png)
    bar = np.array(_rgb(PALETTE[0]))
    col_is_bar = (img == bar).all(axis=2)
    # taller first bar: the leftmost bar's pixel column count exceeds
    # the rightmost bar's
    cols = col_is_bar.sum(axis=0)
    bar_cols = np.flatnonzero(cols > 0)
    assert cols[bar_cols[0]] > cols[bar_cols[-1]]


def test_train_test_distribution_renders_both_series():
    train = [(f"w{i}", 100 - i) for i in range(10)]
    test = [(f"w{i}", 60 - i) for i in range(0, 10, 2)]
    img = decode_png(plot_train_test_distribution(train, test))
    flat = img.reshape(-1, 3)
    assert (flat == _rgb(PALETTE[0])).all(axis=1).any()  # train bars
    assert (flat == _rgb(PALETTE[1])).all(axis=1).any()  # test bars


def test_feature_weights_signed_colors():
    pairs = [("neg", -1.5), ("pos", 2.0)]
    img = decode_png(plot_feature_weights(pairs))
    flat = img.reshape(-1, 3)
    assert (flat == _rgb(PALETTE[0])).all(axis=1).any()  # positive blue
    assert (flat == _rgb(PALETTE[7])).all(axis=1).any()  # negative red


def test_f1_scores_accepts_harness_summary_shape():
    s = {
        "SVM": {"f1_mean": 0.91, "f1_std": 0.03},
        "WordMatching": (0.77, 0.08),  # plain tuple form also accepted
    }
    img = decode_png(plot_f1_scores(s))
    assert img.shape[2] == 3 and (img != 255).any()


def test_lexical_dispersion_rows_per_term():
    rows = [(d, t, 0) for d in range(100) for t in (["a", "b"] if d % 2 else ["a"])]
    png = plot_lexical_dispersion(rows, ["a", "b"])
    img = decode_png(png)
    tick = np.array(_rgb(PALETTE[0]), float)
    blended = np.round(255 * 0.15 + tick * 0.85)  # alpha 0.85 over white
    rows_with_ticks = np.flatnonzero((img == blended).all(axis=2).sum(axis=1) > 0)
    # two distinct horizontal strips (term rows) carry ticks
    gaps = np.diff(rows_with_ticks)
    assert (gaps > 1).sum() >= 1


def test_stroke_font_renders_every_glyph():
    """Every glyph draws at least one non-background pixel (catches a
    malformed segment table), and unknown chars fall back to dashes."""
    from diagnosisextraction_ml_spark.functions.figures import _GLYPHS

    for ch in _GLYPHS:
        if ch == " ":
            continue
        c = Canvas(40, 40)
        c.text(4, 4, ch, scale=3.0)
        assert (c.img != 255).any(), f"glyph {ch!r} rendered nothing"
    assert text_width("AUC", 2.0) == 36


def test_rotated_text_box_is_vertical():
    c = Canvas(60, 120)
    c.text(30, 6, "ABCDE", scale=2.0, anchor="ct", rot=90)
    ink = (c.img != 255).any(axis=2)
    ys, xs = np.nonzero(ink)
    # vertical run much taller than wide, centered near x=30
    assert ys.max() - ys.min() > 2 * (xs.max() - xs.min())
    assert abs((xs.max() + xs.min()) / 2 - 30) <= 4


def test_cutoff_plot_decodes_and_is_deterministic(tmp_path):
    """CutOffPlot parity: tpr + 1-fpr lines over the threshold rank,
    byte-deterministic, both series hues present (ref: optimalCutoff,
    src/NLP_functions.py:229-257)."""
    from diagnosisextraction_ml_spark.functions.figures import plot_cutoff

    # monotone curve: tpr rises, fpr rises => spec falls; they cross
    pts = [
        (round(1 - i / 19, 3), i / 19, (i / 19) ** 2) for i in range(20)
    ]  # (score desc, tpr, fpr)
    path = str(tmp_path / "cutoff.png")
    png1 = plot_cutoff(pts, path)
    png2 = plot_cutoff(pts)
    assert png1 == png2
    assert open(path, "rb").read() == png1
    img = decode_png(png1)
    assert img.shape == (480, 640, 3)
    flat = img.reshape(-1, 3)
    assert (flat == _rgb(PALETTE[0])).all(axis=1).any()  # sensitivity line
    assert (flat == _rgb(PALETTE[1])).all(axis=1).any()  # specificity line
    with pytest.raises(ValueError):
        plot_cutoff([])


def test_cutoff_points_agree_with_youden(spark):
    """The figure's intersection row is optimal_cutoff_youden's row when
    the curve is collected unthinned."""
    import numpy as np

    from diagnosisextraction_ml_spark.operators.evaluate import (
        curve_by_threshold,
        cutoff_plot_points,
        optimal_cutoff_youden,
    )

    rows = [((i * 37 % 100) / 100.0, 1 if i % 3 == 0 else 0) for i in range(120)]
    df = spark.createDataFrame(rows, "score double, label int")
    curve = curve_by_threshold(df)
    pts = cutoff_plot_points(curve, max_points=10_000)  # no thinning
    assert len(pts) == curve.count()
    tpr = np.array([p[1] for p in pts])
    spec = 1 - np.array([p[2] for p in pts])
    i_star = int(np.argmin(np.abs(tpr - spec)))
    youden = optimal_cutoff_youden(curve).collect()[0]
    assert pts[i_star][0] == pytest.approx(youden["score"])
    # thinned path stays bounded and keeps the curve's endpoint
    thin = cutoff_plot_points(curve, max_points=8)
    assert len(thin) <= 9  # every-kth ranks plus the kept last row
    assert thin[-1][0] == pytest.approx(pts[-1][0])


@pytest.mark.slow
def test_harness_renders_figures_per_family(patient_df_figures, tmp_path):
    """E2E: fit two model families on the reference corpus and write a
    ROC, PR, confusion, and swarm PNG — the full figure surface of the
    reference notebook (plotSTD, plotPrecisionRecall,
    plot_confusion_matrix, plotSwarm)."""
    from pyspark.sql import functions as F

    from diagnosisextraction_ml_spark.operators.evaluate import (
        confusion_counts,
        swarm_points,
        threshold_predictions,
    )
    from diagnosisextraction_ml_spark.plans.harness import (
        CVConfig,
        TextClassificationHarness,
    )

    cfg = CVConfig(rounds=1, folds=2)
    h = TextClassificationHarness(
        patient_df_figures, ["WordMatching", "NaiveBayes"], cfg
    )
    h.fit_models(persist_models=True)

    roc_path = str(tmp_path / "roc.png")
    pr_path = str(tmp_path / "pr.png")
    h.render_roc_figure(roc_path)
    h.render_pr_figure(pr_path)
    for p in (roc_path, pr_path):
        img = decode_png(open(p, "rb").read())
        assert img.shape == (480, 640, 3)
        # both model families' series hues made it into the figure
        flat = img.reshape(-1, 3)
        assert (flat == _rgb(PALETTE[0])).all(axis=1).any()
        assert (flat == _rgb(PALETTE[1])).all(axis=1).any()

    # confusion + swarm from the median NaiveBayes fold's scores
    med = h.median_iteration("NaiveBayes")
    model = h.fitted[("NaiveBayes", med.round, med.fold)]
    test = h.df.filter(F.col(f"fold_{med.round}") == med.fold)
    scored = model.transform(test).select(
        F.col("p1").alias("score"), F.col("label").alias("label")
    )
    cm_rows = confusion_counts(
        threshold_predictions(scored, "score", 0.5), "label", "pred"
    ).collect()
    cm_png = plot_confusion_matrix(cm_rows, str(tmp_path / "cm.png"))
    assert decode_png(cm_png).shape == (430, 480, 3)

    pts = swarm_points(scored, "score", "label", max_points=500).collect()
    sw_png = plot_swarm(pts, str(tmp_path / "swarm.png"))
    assert decode_png(sw_png).shape == (480, 640, 3)

    # CutOffPlot for the median NaiveBayes fold (optimalCutoff parity)
    co_png = h.render_cutoff_figure("NaiveBayes", str(tmp_path / "cutoff.png"))
    assert decode_png(co_png).shape == (480, 640, 3)


@pytest.fixture(scope="module")
def patient_df_figures(spark):
    from diagnosisextraction_ml_spark.operators.prep import binarize_label
    from diagnosisextraction_ml_spark.sources.readers import read_patient_cache

    df = read_patient_cache(
        spark, "/root/reference/sample_data/autocorrect_dummydata.csv"
    )
    return binarize_label(df, "Outcome", "label").persist()


def test_metric_sweep_figure():
    from diagnosisextraction_ml_spark.functions.figures import plot_metric_sweep

    series = {
        "SVM": [(0.5, 0.95), (0.2, 0.92), (0.1, 0.88), (0.05, 0.81)],
        "WordMatching": [(0.5, 0.83), (0.2, 0.80), (0.1, 0.77), (0.05, 0.71)],
    }
    png = plot_metric_sweep(series, xlabel="PREVALENCE")
    assert png == plot_metric_sweep(series, xlabel="PREVALENCE")
    img = decode_png(png)
    assert img.shape == (480, 640, 3)
    flat = img.reshape(-1, 3)
    for slot in (0, 1):
        assert (flat == _rgb(PALETTE[slot])).all(axis=1).any()


def test_calibration_figure(tmp_path):
    from diagnosisextraction_ml_spark.functions.figures import plot_calibration

    bins = [
        {"bin": b, "n": 100, "mean_score_micro": b * 100_000 + 50_000,
         "pos_rate_micro": b * 90_000 + 30_000}
        for b in range(10)
    ]
    png1 = plot_calibration(bins, str(tmp_path / "cal.png"))
    png2 = plot_calibration(bins)
    assert png1 == png2
    img = decode_png(png1)
    assert img.shape == (480, 640, 3)
    flat = img.reshape(-1, 3)
    assert (flat == _rgb(PALETTE[0])).all(axis=1).any()
    with pytest.raises(ValueError):
        plot_calibration([])


def test_survival_figure_steps(tmp_path):
    from diagnosisextraction_ml_spark.functions.figures import plot_survival

    groups = {
        "a": [(1, 800_000), (3, 500_000), (7, 200_000)],
        "b": [(2, 900_000), (5, 700_000)],
    }
    png = plot_survival(groups, str(tmp_path / "km.png"))
    assert png == plot_survival(groups)
    img = decode_png(png)
    assert img.shape == (480, 640, 3)
    flat = img.reshape(-1, 3)
    assert (flat == _rgb(PALETTE[0])).all(axis=1).any()
    assert (flat == _rgb(PALETTE[1])).all(axis=1).any()
    with pytest.raises(ValueError):
        plot_survival({})
