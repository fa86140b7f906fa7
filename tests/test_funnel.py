"""Funnel conversion & cohort retention — ordering and horizon semantics."""

from __future__ import annotations

from datetime import datetime

import pytest

from diagnosisextraction_ml_spark.operators import funnel


def _ev(uid, typ, day, hour=0):
    return (uid, typ, datetime(2024, 1, day, hour))


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1: full ordered funnel
        _ev(1, "view", 1), _ev(1, "click", 2), _ev(1, "purchase", 3),
        # u2: clicked BEFORE viewing → click doesn't qualify
        _ev(2, "click", 1), _ev(2, "view", 2), _ev(2, "purchase", 3),
        # u3: view + click, purchase outside the 72h horizon
        _ev(3, "view", 1), _ev(3, "click", 1, 12), _ev(3, "purchase", 10),
        # u4: view only
        _ev(4, "view", 5),
        # u5: purchase only (never enters the funnel)
        _ev(5, "purchase", 1),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def test_funnel_order_and_horizon(spark, events):
    got = {
        r.step: (r.users, r.conv_from_prev)
        for r in funnel.funnel_conversion(
            events, ["view", "click", "purchase"], horizon_hours=72
        ).collect()
    }
    assert got["view"] == (4, 1.0)        # u1 u2 u3 u4
    assert got["click"] == (2, 0.5)       # u1, u3 (u2's click precedes view)
    assert got["purchase"] == (1, 0.5)    # u1 only (u3 outside horizon)


def test_funnel_no_horizon_recovers_late_purchase(spark, events):
    got = {
        r.step: r.users
        for r in funnel.funnel_conversion(
            events, ["view", "click", "purchase"]
        ).collect()
    }
    assert got["purchase"] == 2  # u3's day-10 purchase now counts


def test_funnel_same_timestamp_counts(spark):
    rows = [_ev(1, "view", 1, 6), _ev(1, "click", 1, 6)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        r.step: r.users
        for r in funnel.funnel_conversion(df, ["view", "click"]).collect()
    }
    assert got == {"view": 1, "click": 1}  # 'at or after' is inclusive


def test_cohort_retention_grid(spark):
    rows = [
        # cohort of Jan-1 week: u1 active weeks 0,1,2; u2 weeks 0,2
        _ev(1, "view", 1), _ev(1, "view", 8), _ev(1, "view", 15),
        _ev(2, "view", 2), _ev(2, "view", 16),
        # cohort of Jan-8 week: u3 active week 0 only
        _ev(3, "view", 9),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        (str(r.cohort_week), r.week_offset): (r.users, r.retention)
        for r in funnel.cohort_retention(df).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-01", 2)] == (2, 1.0)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert len(got) == 4
