"""Funnel conversion & cohort retention — ordering and horizon semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

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
    out = funnel.cohort_retention(df)
    # cohort_week is a TIMESTAMP final (midnight Monday) — see operator
    assert dict(out.dtypes)["cohort_week"] == "timestamp"
    got = {
        (str(r.cohort_week.date()), r.week_offset): (r.users, r.retention)
        for r in out.collect()
    }
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-01", 2)] == (2, 1.0)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert len(got) == 4


def test_funnel_latency_quantiles_hand_case(spark):
    import datetime as dt

    from diagnosisextraction_ml_spark.operators.funnel import funnel_latency_quantiles

    def ts(m):
        return dt.datetime(2024, 1, 1, 0, m)

    # user 1: view@0 click@10 buy@20; user 2: view@0 click@40; user 3: click only
    rows = [
        (1, "view", ts(0)), (1, "click", ts(10)), (1, "purchase", ts(20)),
        (2, "view", ts(0)), (2, "click", ts(40)),
        (3, "click", ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = funnel_latency_quantiles(df, ["view", "click", "purchase"])
    rows_out = {(r["step"], r["p_num"], r["p_den"]): r for r in out.collect()}
    # click latencies: {600, 2400}; p50 target rank 1 -> 600s bin
    med = rows_out[("click", 1, 2)]
    assert med["bin_lo"] <= 600 < med["bin_hi"]
    p99 = rows_out[("click", 99, 100)]
    assert p99["bin_lo"] <= 2400 < p99["bin_hi"]
    # purchase latencies: {600} only
    pm = rows_out[("purchase", 1, 2)]
    assert pm["bin_lo"] <= 600 < pm["bin_hi"] and pm["target_rank"] == 1


def test_top_event_paths_small(spark):
    from diagnosisextraction_ml_spark.operators.funnel import top_event_paths

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for u, seq in [(1, "abcab"), (2, "abc"), (3, "ab")]:
        for i, et in enumerate(seq):
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, et))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {r["path"]: r for r in top_event_paths(df, n=3, k=10).collect()}
    # user1: abc, bca, cab; user2: abc; user3 too short
    assert got["a>b>c"]["n_occurrences"] == 2
    assert got["a>b>c"]["n_users"] == 2
    assert got["b>c>a"]["n_occurrences"] == 1
    assert set(got) == {"a>b>c", "b>c>a", "c>a>b"}


def test_top_event_paths_tiebreak_total_order(spark):
    """Same-timestamp events order by the tiebreaker, so the path set is
    deterministic on any partitioning."""
    from diagnosisextraction_ml_spark.operators.funnel import top_event_paths

    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [(i, t0, 1, "xyz"[i % 3]) for i in range(6)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    a = sorted(map(tuple, top_event_paths(df.coalesce(1), n=2, k=10).collect()))
    b = sorted(map(tuple, top_event_paths(df.repartition(5), n=2, k=10).collect()))
    assert a == b
    assert ("x>y", 2, 1) in a  # positions (0,1) and (3,4)


def test_rolling_active_users_hand_case(spark):
    import datetime as dt

    from diagnosisextraction_ml_spark.operators.funnel import rolling_active_users

    d0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    # user 1 active days 0,1; user 2 active day 0; user 3 active day 8
    for u, day in [(1, 0), (1, 0), (1, 1), (2, 0), (3, 8)]:
        rows.append((eid, d0 + dt.timedelta(days=day, hours=1), u))
        eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = {r["day"]: r for r in rolling_active_users(df, window_days=7).collect()}
    day0 = int(d0.replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    assert out[day0]["dau"] == 2 and out[day0]["rolling_active"] == 2
    assert out[day0 + 1]["dau"] == 1
    assert out[day0 + 1]["rolling_active"] == 2  # u1 + u2 within 7 days
    # day 8: only u3 (u1/u2 activity aged out of the 7-day window)
    assert out[day0 + 8]["dau"] == 1 and out[day0 + 8]["rolling_active"] == 1
    assert set(out) == {day0, day0 + 1, day0 + 8}  # only active days emit
    # invariance
    a = sorted(map(tuple, rolling_active_users(df.coalesce(1)).collect()))
    b = sorted(map(tuple, rolling_active_users(df.repartition(5)).collect()))
    assert a == b


def test_lasttouch_attribution_semantics(spark):
    import datetime as dt

    from diagnosisextraction_ml_spark.operators.funnel import lasttouch_attribution

    d0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1: click → purchase(10), view → purchase(5) — credit click then view
        (1, d0 + 0 * s, 1, "click", 0.0),
        (2, d0 + 1 * s, 1, "purchase", 10.0),
        (3, d0 + 2 * s, 1, "view", 0.0),
        (4, d0 + 3 * s, 1, "purchase", 5.0),
        # u2: purchase with NO prior touch → (none); error is not a touch
        (5, d0 + 0 * s, 2, "error", 0.0),
        (6, d0 + 1 * s, 2, "purchase", 7.0),
        # u3: same-timestamp tie broken by event_id: click(7) before purchase(8)
        (7, d0 + 0 * s, 3, "click", 0.0),
        (8, d0 + 0 * s, 3, "purchase", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r["channel"]: (r["n_conversions"], r["revenue"]) for r in
           lasttouch_attribution(df).collect()}
    assert out["click"] == (2, 12.0)
    assert out["view"] == (1, 5.0)
    assert out["(none)"] == (1, 7.0)
    # partition invariance
    a = sorted(map(tuple, lasttouch_attribution(df.coalesce(1)).collect()))
    b = sorted(map(tuple, lasttouch_attribution(df.repartition(5)).collect()))
    assert a == b


def test_linear_attribution_hand_case(spark):
    from diagnosisextraction_ml_spark.operators.funnel import linear_attribution

    rows = [
        # user 1: click, view, view, purchase(30) -> click 10, view 20
        (1, 1, "2024-01-01 00:00:00", "click", 0.0),
        (2, 1, "2024-01-01 00:01:00", "view", 0.0),
        (3, 1, "2024-01-01 00:02:00", "view", 0.0),
        (4, 1, "2024-01-01 00:03:00", "purchase", 30.0),
        # user 2: purchase with no touches -> (none) 5
        (5, 2, "2024-01-01 00:00:00", "purchase", 5.0),
        # user 1 second purchase(8) after one more click:
        # counts now click=2, view=2 -> 4 each
        (6, 1, "2024-01-01 00:04:00", "click", 0.0),
        (7, 1, "2024-01-01 00:05:00", "purchase", 8.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["channel"]: (r["n_conversions"], r["revenue"]) for r in linear_attribution(ev).collect()}
    assert got["click"] == (2, 14.0)   # 10 + 4
    assert got["view"] == (2, 24.0)    # 20 + 4
    assert got["(none)"] == (1, 5.0)


def test_linear_attribution_counts_zero_and_null_value_conversions(spark):
    """Zero- and NULL-value conversions still count toward
    n_conversions (revenue contribution 0), and channels the user
    never touched get no row — so per-conversion totals agree with
    lasttouch_attribution."""
    from diagnosisextraction_ml_spark.operators.funnel import (
        lasttouch_attribution,
        linear_attribution,
    )

    rows = [
        # user 1: click then zero-value purchase -> click credits 0 but counts
        (1, 1, "2024-01-01 00:00:00", "click", 0.0),
        (2, 1, "2024-01-01 00:01:00", "purchase", 0.0),
        # user 2: view then NULL-value purchase -> view counts, revenue 0
        (3, 2, "2024-01-01 00:00:00", "view", 0.0),
        (4, 2, "2024-01-01 00:01:00", "purchase", None),
        # user 3: no touch, zero-value purchase -> (none) counts
        (5, 3, "2024-01-01 00:00:00", "purchase", 0.0),
        # user 4: normal click purchase for a non-degenerate row
        (6, 4, "2024-01-01 00:00:00", "click", 0.0),
        (7, 4, "2024-01-01 00:01:00", "purchase", 10.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["channel"]: (r["n_conversions"], r["revenue"])
        for r in linear_attribution(ev).collect()
    }
    assert got["click"] == (2, 10.0)
    assert got["view"] == (1, 0.0)
    assert got["(none)"] == (1, 0.0)
    # a channel with zero prior touches for a conversion gets no row
    # beyond the ones above (user 1's purchase credits click only)
    assert set(got) == {"click", "view", "(none)"}
    # per-operator conversion totals agree
    lt_total = sum(
        r["n_conversions"] for r in lasttouch_attribution(ev).collect()
    )
    assert sum(n for n, _ in got.values()) == lt_total == 4
