"""Exact-rational two-proportion A/B test."""

from __future__ import annotations

import math

from diagnosisextraction_ml_spark.operators.experiment import two_proportion_test


def _run(spark, n0, x0, n1, x1):
    rows = (
        [(0, 1)] * x0 + [(0, 0)] * (n0 - x0) + [(1, 1)] * x1 + [(1, 0)] * (n1 - x1)
    )
    df = spark.createDataFrame(rows, "arm int, converted int")
    return two_proportion_test(df).collect()[0]


def _z(n0, x0, n1, x1):
    p0, p1 = x0 / n0, x1 / n1
    p = (x0 + x1) / (n0 + n1)
    return (p1 - p0) / math.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))


def test_ab_clear_lift_significant(spark):
    r = _run(spark, 500, 50, 500, 100)  # 10% vs 20%
    assert abs(_z(500, 50, 500, 100)) > 1.96
    assert r["significant"] is True
    assert r["diff_micro"] == (1_000_000 * (100 * 500 - 50 * 500)) // (500 * 500)


def test_ab_no_lift_not_significant(spark):
    r = _run(spark, 500, 100, 500, 104)
    assert abs(_z(500, 100, 500, 104)) < 1.96
    assert r["significant"] is False


def test_ab_matches_float_z_on_grid(spark):
    # the exact inequality must agree with the float z-test away from
    # exact-boundary cases across a grid of arm outcomes
    for x1 in (60, 80, 100, 120, 140):
        r = _run(spark, 400, 80, 400, x1)
        z = _z(400, 80, 400, x1)
        if abs(abs(z) - 1.96) > 1e-6:
            assert r["significant"] == (abs(z) > 1.96), (x1, z)


def test_ab_negative_lift_sign(spark):
    r = _run(spark, 300, 90, 300, 30)
    assert r["diff_micro"] < 0 and r["significant"] is True
