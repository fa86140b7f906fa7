"""Statistical helpers (SURVEY.md §2.7 E11) — no scipy dependency.

The 5x2cv paired t-test (Dietterich 1998) compares two models' AUC
lists from 5 rounds x 2 folds of cross-validation. Ref: ttest_5x2cv,
src/TextClassification.py:1520-1574 (used notebook cells 48/52/56).
It is driver-side math over 10 collected scalars — no Spark needed —
but scipy is not a dependency here, so the Student-t survival function
is implemented via the regularized incomplete beta function
(continued-fraction evaluation, Numerical-Recipes-style; public
standard math).
"""

from __future__ import annotations

import math
from collections.abc import Sequence


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function."""
    MAXIT, EPS, FPMIN = 200, 3.0e-12, 1.0e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf(t: float, df: float) -> float:
    """Student-t survival function P(T > t) (one-sided)."""
    if df <= 0:
        raise ValueError("df must be positive")
    x = df / (df + t * t)
    p = 0.5 * betainc_reg(df / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def ttest_5x2cv(
    scores_a: Sequence[float], scores_b: Sequence[float]
) -> tuple[float, float]:
    """E11 — Dietterich 5x2cv paired t-test on two 10-long score lists.

    Scores are ordered (round0 fold0, round0 fold1, round1 fold0, ...).
    Returns (t_statistic, two_sided_p). Ref: ttest_5x2cv,
    src/TextClassification.py:1520-1574.
    """
    if len(scores_a) != 10 or len(scores_b) != 10:
        raise ValueError("5x2cv needs exactly 10 scores per model")
    variances = []
    first_diff = None
    for r in range(5):
        d1 = scores_a[2 * r] - scores_b[2 * r]
        d2 = scores_a[2 * r + 1] - scores_b[2 * r + 1]
        mean = (d1 + d2) / 2.0
        var = (d1 - mean) ** 2 + (d2 - mean) ** 2
        variances.append(var)
        if r == 0:
            first_diff = d1
    denom = math.sqrt(sum(variances) / 5.0)
    if denom == 0.0:
        return (math.inf if first_diff else 0.0), 0.0 if first_diff else 1.0
    t_stat = first_diff / denom
    p = 2.0 * t_sf(abs(t_stat), 5.0)
    return t_stat, p
