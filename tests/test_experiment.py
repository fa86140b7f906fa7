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


# ---------------------------------------------------------------------------
# Kaplan-Meier
# ---------------------------------------------------------------------------

def test_kaplan_meier_textbook(spark):
    """Classic small example: subjects with durations/censoring, checked
    against the hand-computed product-limit values."""
    from diagnosisextraction_ml_spark.operators.experiment import kaplan_meier

    # durations (t, observed): events at t=1 (1 of 5 at risk),
    # censored at t=2, event at t=3 (1 of 3 at risk), event at t=4
    # (1 of 2), censored at t=5
    rows = [(1, 1), (2, 0), (3, 1), (4, 1), (5, 0)]
    df = spark.createDataFrame(rows, "dur int, obs int")
    km = {r["t"]: r for r in kaplan_meier(df, "dur", "obs").collect()}
    assert set(km) == {1, 3, 4}
    assert km[1]["n_at_risk"] == 5 and km[1]["d"] == 1
    assert km[1]["survival_micro"] == 800_000            # 4/5
    assert km[3]["n_at_risk"] == 3
    assert km[3]["survival_micro"] == round(0.8 * 2 / 3 * 1e6)
    assert km[4]["n_at_risk"] == 2
    assert km[4]["survival_micro"] == round(0.8 * (2 / 3) * 0.5 * 1e6)


def test_kaplan_meier_extinction_and_groups(spark):
    from diagnosisextraction_ml_spark.operators.experiment import kaplan_meier

    rows = [
        ("a", 1, 1), ("a", 1, 1),            # everyone dies at t=1
        ("b", 1, 1), ("b", 2, 0), ("b", 3, 1),
    ]
    df = spark.createDataFrame(rows, "g string, dur int, obs int")
    km = {(r["g"], r["t"]): r for r in kaplan_meier(df, "dur", "obs", "g").collect()}
    assert km[("a", 1)]["survival_micro"] == 0           # extinction -> 0, no ln(0)
    assert km[("b", 1)]["survival_micro"] == round(2 / 3 * 1e6)
    assert km[("b", 3)]["survival_micro"] == 0           # last subject dies
    # censoring-only times never appear as rows
    assert ("b", 2) not in km


def test_kaplan_meier_partitioning_invariance(spark):
    from diagnosisextraction_ml_spark.operators.experiment import kaplan_meier

    rows = [(chr(97 + i % 3), (i * 7) % 20 + 1, i % 5 != 0) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, dur int, obs boolean")
    a = sorted(map(tuple, kaplan_meier(df.coalesce(1), "dur", "obs", "g").collect()))
    b = sorted(map(tuple, kaplan_meier(df.repartition(13), "dur", "obs", "g").collect()))
    assert a == b and len(a) > 10


def test_kaplan_meier_matches_python_replay_many_groups(spark):
    """10 seeded pseudo-random censored cohorts in one frame: the
    windowed plan must match a literal product-limit replay per group."""
    import hashlib
    import math

    from diagnosisextraction_ml_spark.operators.experiment import kaplan_meier

    def h(g, i, m):
        return int(hashlib.md5(f"{g}:{i}".encode()).hexdigest()[:6], 16) % m

    rows = []
    for g in range(10):
        for i in range(60):
            rows.append((f"g{g}", h(g, i, 15) + 1, int(h(g, i + 1000, 4) != 0)))
    df = spark.createDataFrame(rows, "g string, dur int, obs int")
    got = {
        (r["g"], r["t"]): r
        for r in kaplan_meier(df, "dur", "obs", "g").collect()
    }
    for g in range(10):
        subj = [(h(g, i, 15) + 1, int(h(g, i + 1000, 4) != 0)) for i in range(60)]
        times = sorted({t for t, o in subj if o})
        surv = 1.0
        for t in times:
            n_at_risk = sum(1 for d, _ in subj if d >= t)
            d_events = sum(1 for d, o in subj if d == t and o)
            row = got[(f"g{g}", t)]
            assert row["n_at_risk"] == n_at_risk
            assert row["d"] == d_events
            if n_at_risk == d_events:
                surv = 0.0
            else:
                # replay through the same ln/exp path as the plan
                surv = math.exp(
                    math.log(surv if surv > 0 else 1.0)
                    + math.log(n_at_risk - d_events)
                    - math.log(n_at_risk)
                ) if surv > 0 else 0.0
            assert row["survival_micro"] == round(surv * 1_000_000), (g, t)
