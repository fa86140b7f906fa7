"""QC profiling and continuous-rollup maintenance."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.operators.profile import (
    check_expectations,
    profile_columns,
)
from diagnosisextraction_ml_spark.operators.rollup import (
    hourly_rollup,
    merge_rollup,
)


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [
        (1, "a", 10),
        (2, "a", None),
        (3, None, 30),
        (3, "b", 30),
    ]
    return spark.createDataFrame(rows, "k long, s string, v long")


def test_profile_columns(spark, tbl):
    prof = {r.column: r for r in profile_columns(tbl, ["k", "s", "v"]).collect()}
    assert prof["k"].n_rows == 4 and prof["k"].n_null == 0
    assert prof["k"].n_distinct == 3
    assert (prof["k"].min_val, prof["k"].max_val) == ("1", "3")
    assert prof["s"].n_null == 1 and prof["s"].n_distinct == 2
    assert prof["v"].n_null == 1 and prof["v"].min_val == "10"


def test_profile_approx_mode_runs(spark, tbl):
    # approx=True swaps exact distinct for HLL++ — schema identical
    exact = profile_columns(tbl, ["k"]).collect()[0]
    approx = profile_columns(tbl, ["k"], approx=True).collect()[0]
    assert approx.n_rows == exact.n_rows
    assert approx.n_distinct > 0


def test_expectations(spark, tbl):
    out = {
        r.rule: r
        for r in check_expectations(
            tbl,
            {
                "k_positive": F.col("k") > 0,
                "s_not_null": F.col("s").isNotNull(),
                "v_over_20": F.col("v") > 20,
            },
        ).collect()
    }
    assert out["k_positive"].n_violations == 0 and out["k_positive"]["pass"]
    assert out["s_not_null"].n_violations == 1 and not out["s_not_null"]["pass"]
    # null predicate counts as violation (v is NULL on one row)
    assert out["v_over_20"].n_violations == 2


@pytest.fixture(scope="module")
def ev(spark):
    rows = []
    for i in range(200):
        rows.append(
            (i, dt.datetime(2024, 1, 1, i % 5, i % 60), "t" + str(i % 3), float(i) / 7)
        )
    return spark.createDataFrame(rows, "event_id long, ts timestamp, et string, value double")


def _grain(df):
    return {
        (r.window_start, r.et): (r.n, r.sum_value, r.min_value, r.max_value)
        for r in df.collect()
    }


def test_rollup_merge_equals_recompute(spark, ev):
    a = ev.filter(F.col("event_id") % 3 == 0)
    b = ev.filter(F.col("event_id") % 3 != 0)
    merged = merge_rollup(
        hourly_rollup(a, dims=["et"]), hourly_rollup(b, dims=["et"]), dims=["et"]
    )
    oneshot = hourly_rollup(ev, dims=["et"])
    assert _grain(merged) == _grain(oneshot)


def test_rollup_merge_associative_three_way(spark, ev):
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    left = merge_rollup(
        merge_rollup(
            hourly_rollup(parts[0], dims=["et"]),
            hourly_rollup(parts[1], dims=["et"]),
            dims=["et"],
        ),
        hourly_rollup(parts[2], dims=["et"]),
        dims=["et"],
    )
    assert _grain(left) == _grain(hourly_rollup(ev, dims=["et"]))


def test_rollup_sums_are_exact_decimal(spark, ev):
    # the state table carries DECIMAL sums — exact and associative
    out = hourly_rollup(ev, dims=["et"])
    assert dict(out.dtypes)["sum_value"] == "decimal(30,6)"
    row = out.filter((F.col("et") == "t0")).orderBy("window_start").first()
    assert isinstance(row.sum_value, Decimal)


def test_expectations_reserved_names(spark, tbl):
    import pyspark.sql.functions as F
    import pytest as _pt

    with _pt.raises(ValueError, match="reserved"):
        check_expectations(tbl, {"n_rows": F.col("k") > 0})


def test_interval_concurrency_hand_case(spark):
    from diagnosisextraction_ml_spark.operators.rollup import (
        interval_concurrency_daily,
    )

    D = 86400
    # day 0: [10,100] [50,200] [150,300] -> peak 2 (overlaps at 50-100,150-200)
    # one interval spans midnight into day 1: [D-50, D+1000]
    # day 1 has NO deltas besides the carried interval's end: its peak
    # must still see the carry-over of 1 at midnight
    iv = spark.createDataFrame(
        [(10, 100), (50, 200), (150, 300), (D - 50, D + 1000)],
        "s long, e long",
    )
    out = {
        r["day_idx"]: r["peak_concurrency"]
        for r in interval_concurrency_daily(iv, "s", "e", 0, 3 * D).collect()
    }
    assert out[0] == 2
    assert out[1] == 1  # carried concurrency, no start inside day 1
    assert out[2] == 0  # empty day still reported, peak 0
    # triple overlap check
    iv2 = spark.createDataFrame([(0, 100), (10, 90), (20, 80)], "s long, e long")
    out2 = {
        r["day_idx"]: r["peak_concurrency"]
        for r in interval_concurrency_daily(iv2, "s", "e", 0, D).collect()
    }
    assert out2[0] == 3


def test_interval_concurrency_partitioning_invariant(spark):
    from diagnosisextraction_ml_spark.operators.rollup import (
        interval_concurrency_daily,
    )

    iv = spark.createDataFrame(
        [(i * 37 % 5000, i * 37 % 5000 + (i % 900)) for i in range(400)],
        "s long, e long",
    )
    a = sorted(map(tuple, interval_concurrency_daily(iv.repartition(1), "s", "e", 0, 86400).collect()))
    b = sorted(map(tuple, interval_concurrency_daily(iv.repartition(9), "s", "e", 0, 86400).collect()))
    assert a == b


def test_markov_benford_robust_registry_semantics(spark, sf_dir):
    """Hand-check the three late-session analytics entries."""
    from diagnosisextraction_ml_spark.plans.queries import queries

    qs = queries()
    # Markov: probabilities per source state sum to ~1e6 (floor division)
    mk = qs["events_markov_transitions"](spark, sf_dir)
    import pyspark.sql.functions as F

    sums = mk.groupBy("prev_type").agg(F.sum("prob_micro").alias("s")).collect()
    for r in sums:
        assert 1_000_000 - 25 <= r["s"] <= 1_000_000
    # Benford: expected masses sum to ~1e6 and digits are 1..9
    bf = {r["digit"]: r for r in qs["qc_benford_digits"](spark, sf_dir).collect()}
    assert set(bf) <= set(range(1, 10))
    assert abs(sum(r["benford_micro"] for r in bf.values()) - 1_000_000) < 10
    # robust stats: MAD <= max deviation, outliers < n
    rs = qs["ts_robust_stats"](spark, sf_dir).collect()
    for r in rs:
        assert 0 <= r["n_outliers"] < r["n"]
        assert r["mad_val"] >= 0


def test_robust_stats_flags_planted_outlier(spark):
    from diagnosisextraction_ml_spark.plans.queries import queries

    import pyspark.sql.functions as F
    from diagnosisextraction_ml_spark.operators import rollup  # noqa: F401

    # direct reconstruction: tight cluster + one wild point
    rows = [("a", float(100 + (i % 5))) for i in range(50)] + [("a", 10_000.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    med = df.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("m"))
    dev = df.join(med, "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("m")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    out = (
        dev.join(mad, "event_type")
        .filter(F.lit(10000) * F.col("adev") > F.lit(44478) * F.col("mad"))
        .count()
    )
    assert out == 1


# ---------------------------------------------------------------------------
# CUSUM drift + PSI
# ---------------------------------------------------------------------------

def test_cusum_detects_level_shift(spark):
    from diagnosisextraction_ml_spark.operators.rollup import cusum_drift

    # flat at 10 for 20 buckets, then a +5 level shift for 20 more
    rows = [("k", t, 10 if t < 20 else 15) for t in range(40)]
    df = spark.createDataFrame(rows, "key string, t int, v int")
    out = {r["t"]: r for r in cusum_drift(df, ["key"], "t", "v", 40_000_000).collect()}
    # mean = 12.5 -> pre-shift s drifts down, post-shift climbs up
    assert not out[19]["drift_up"]
    assert out[39]["drift_up"]          # cumulated +2.5*20 = 50 units > 40
    assert out[19]["cusum_down_micro"] == 50_000_000  # 2.5 * 20 below mean
    assert out[39]["cusum_up_micro"] == 50_000_000
    # closed form == recursive CUSUM on the same series
    s, smin, cus = 0, 0, []
    for t in range(40):
        s += (10 if t < 20 else 15) * 1_000_000 - 12_500_000
        smin = min(smin, s)
        cus.append(s - smin)
    for t in range(40):
        assert int(out[t]["cusum_up_micro"]) == cus[t]


def test_cusum_partitioning_invariance(spark):
    from diagnosisextraction_ml_spark.operators.rollup import cusum_drift

    rows = [(f"k{i%3}", t, (i * t) % 17) for i, t in
            ((i, t) for i in range(3) for t in range(50))]
    df = spark.createDataFrame(rows, "key string, t int, v int")
    a = sorted(map(tuple, cusum_drift(df.coalesce(1), ["key"], "t", "v", 10**6).collect()))
    b = sorted(map(tuple, cusum_drift(df.repartition(7), ["key"], "t", "v", 10**6).collect()))
    assert a == b


def test_psi_identical_and_shifted(spark):
    from diagnosisextraction_ml_spark.operators.profile import psi_drift, psi_total

    base = spark.createDataFrame([(float(i % 100),) for i in range(5000)], "v double")
    same = psi_total(psi_drift(base, base, "v", 0.0, 100.0, 10)).collect()[0]
    assert same["psi_micro"] == 0
    shifted = spark.createDataFrame(
        [(float(i % 100) * 0.3 + 60,) for i in range(5000)], "v double"
    )
    drift = psi_total(psi_drift(base, shifted, "v", 0.0, 100.0, 10)).collect()[0]
    assert drift["psi_micro"] > 250_000  # way past the 0.25 "shifted" bar


def test_psi_hand_computed_two_bins(spark):
    import math

    from diagnosisextraction_ml_spark.operators.profile import psi_drift

    base = spark.createDataFrame([(1.0,)] * 30 + [(9.0,)] * 10, "v double")
    curr = spark.createDataFrame([(1.0,)] * 10 + [(9.0,)] * 30, "v double")
    rows = {r["bin"]: r for r in psi_drift(base, curr, "v", 0.0, 10.0, 2).collect()}
    # add-1: a=31,b=11,ta=42,tb=42 for bin 0; symmetric for bin 1
    p, q = 31 / 42, 11 / 42
    expect = round((p - q) * math.log(p / q) * 1e6)
    assert rows[0]["psi_term_micro"] == expect
    assert rows[1]["psi_term_micro"] == expect  # symmetric
    assert rows[0]["n_base"] == 30 and rows[0]["n_curr"] == 10


def test_psi_validation(spark):
    import pytest

    from diagnosisextraction_ml_spark.operators.profile import psi_drift

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        psi_drift(df, df, "v", 5.0, 5.0, 10)
    with pytest.raises(ValueError):
        psi_drift(df, df, "v", 0.0, 1.0, 1)


def test_cusum_closed_form_equals_recursive_many_series(spark):
    """20 seeded pseudo-random series in one frame: the windowed closed
    form must equal the literal recursive CUSUM for every key."""
    import hashlib

    from diagnosisextraction_ml_spark.operators.rollup import cusum_drift

    def h(k, t):
        return int(hashlib.md5(f"{k}:{t}".encode()).hexdigest()[:6], 16) % 30

    rows = [(f"k{k}", t, h(k, t)) for k in range(20) for t in range(40)]
    df = spark.createDataFrame(rows, "key string, t int, v int")
    got = {
        (r["key"], r["t"]): (int(r["cusum_up_micro"]), int(r["cusum_down_micro"]))
        for r in cusum_drift(df, ["key"], "t", "v", 10**9).collect()
    }
    for k in range(20):
        vals = [h(k, t) for t in range(40)]
        tot, n = sum(vals), len(vals)
        mu = (1_000_000 * tot) // n
        s = smin = smax = 0
        for t, v in enumerate(vals):
            s += 1_000_000 * v - mu
            smin, smax = min(smin, s), max(smax, s)
            assert got[(f"k{k}", t)] == (s - min(0, smin), max(0, smax) - s), (k, t)


def test_ks_distance_hand_case(spark):
    from diagnosisextraction_ml_spark.operators.profile import ks_distance

    # base uniform {1..4}, current all at 4: D = 3/4 at v=3
    base = spark.createDataFrame([(float(v),) for v in (1, 2, 3, 4)], "v double")
    curr = spark.createDataFrame([(4.0,)] * 4, "v double")
    r = ks_distance(base, curr, "v", value_range=(0.0, 5.0)).collect()[0]
    assert r["n_base"] == 4 and r["n_curr"] == 4
    assert r["ks_micro"] == 750_000
    assert r["at_value"] == 3.0
    # identical samples: D = 0
    same = ks_distance(base, base, "v", value_range=(0.0, 5.0)).collect()[0]
    assert same["ks_micro"] == 0


def test_ks_distance_matches_numpy(spark):
    import numpy as np

    from diagnosisextraction_ml_spark.operators.profile import ks_distance

    a = [((i * 37) % 100) / 10.0 for i in range(200)]
    b = [((i * 53) % 100) / 10.0 + 1.5 for i in range(150)]
    dfa = spark.createDataFrame([(v,) for v in a], "v double")
    dfb = spark.createDataFrame([(v,) for v in b], "v double")
    r = ks_distance(dfa, dfb, "v", value_range=(0.0, 12.0)).collect()[0]
    xs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    d = np.abs(fa - fb).max()
    assert r["ks_micro"] == int(1_000_000 * d)  # exact rational floor
    # bucketed cumsum invariance: different bucket counts, same answer
    r2 = ks_distance(dfa, dfb, "v", value_range=(0.0, 12.0), n_buckets=7).collect()[0]
    assert (r["ks_micro"], r["at_value"]) == (r2["ks_micro"], r2["at_value"])


def test_woe_iv_hand_case(spark):
    import math

    from diagnosisextraction_ml_spark.operators.profile import woe_iv

    # bin 0: 30 pos / 10 neg; bin 1: 10 pos / 30 neg
    rows = (
        [(1.0, 1)] * 30 + [(1.0, 0)] * 10 + [(9.0, 1)] * 10 + [(9.0, 0)] * 30
    )
    df = spark.createDataFrame(rows, "v double, y int")
    out = {r["bin"]: r for r in woe_iv(df, "v", "y", 0.0, 10.0, 2).collect()}
    a, ta, c, tc = 31, 42, 11, 42
    woe = math.log(a) - math.log(ta) - math.log(c) + math.log(tc)
    assert out[0]["woe_micro"] == round(woe * 1e6)
    assert out[1]["woe_micro"] == -round(woe * 1e6) + round(
        (math.log(11) - math.log(42) - math.log(31) + math.log(42)) * 1e6
    ) + round(woe * 1e6)  # symmetric bins: equal magnitude, opposite sign
    assert out[0]["iv_term_micro"] == round((a / ta - c / tc) * woe * 1e6)
    assert out[0]["iv_term_micro"] == out[1]["iv_term_micro"]
    assert out[0]["n_pos"] == 30 and out[1]["n_neg"] == 30


def test_woe_iv_validation(spark):
    import pytest

    from diagnosisextraction_ml_spark.operators.profile import woe_iv

    df = spark.createDataFrame([(1.0, 1)], "v double, y int")
    with pytest.raises(ValueError):
        woe_iv(df, "v", "y", 1.0, 1.0, 5)


# ---------------------------------------------------------------------------
# TWA + LOCF gapfill
# ---------------------------------------------------------------------------

def test_twa_hand_case(spark):
    import datetime as dt

    from diagnosisextraction_ml_spark.operators.rollup import (
        time_weighted_avg_hourly,
    )

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def at(mins):
        return t0 + dt.timedelta(minutes=mins)

    # value 10 held 0:00->0:30, value 20 held 0:30->1:30, sentinel at 1:30
    rows = [("k", at(0), 10.0), ("k", at(30), 20.0), ("k", at(90), 0.0)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = {r["hour"]: r for r in
           time_weighted_avg_hourly(df, ["key"], "ts", "v").collect()}
    h0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
    # hour 0: 30 min at 10 + 30 min at 20 = avg 15
    assert out[h0]["covered_s"] == 3600
    assert out[h0]["twa_micro"] == 15_000_000
    # hour 1: 30 min at 20 (sentinel ends the hold)
    assert out[h0 + 1]["covered_s"] == 1800
    assert out[h0 + 1]["twa_micro"] == 20_000_000
    # last sample (the sentinel) holds nothing beyond
    assert set(out) == {h0, h0 + 1}


def test_twa_clamps_long_gaps(spark):
    import datetime as dt

    from diagnosisextraction_ml_spark.operators.rollup import (
        time_weighted_avg_hourly,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = [("k", t0, 5.0), ("k", t0 + dt.timedelta(days=10), 7.0),
            ("k", t0 + dt.timedelta(days=10, hours=1), 0.0)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = time_weighted_avg_hourly(df, ["key"], "ts", "v", max_span_hours=2).collect()
    # first interval clamped to 2h => 2 hourly rows; second gives 1
    assert len(out) == 3
    assert sum(r["covered_s"] for r in out) == 2 * 3600 + 3600


def test_gapfill_locf_hand_case(spark):
    import datetime as dt

    from diagnosisextraction_ml_spark.operators.rollup import gapfill_locf_hourly

    t0 = dt.datetime(2026, 1, 1, 0, 15)
    rows = [
        ("k", t0, 1.0),
        ("k", t0 + dt.timedelta(hours=3), 4.0),   # hours 1-2 are gaps
        ("k", t0 + dt.timedelta(hours=3, minutes=10), 5.0),  # same hour: last wins
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = {r["hour"]: r for r in gapfill_locf_hourly(df, ["key"], "ts", "v").collect()}
    h0 = int(t0.replace(minute=0, tzinfo=dt.timezone.utc).timestamp()) // 3600
    assert len(out) == 4  # dense axis h0..h0+3
    assert out[h0]["value_micro"] == 1_000_000 and not out[h0]["is_gap"]
    assert out[h0 + 1]["value_micro"] == 1_000_000 and out[h0 + 1]["is_gap"]
    assert out[h0 + 2]["value_micro"] == 1_000_000 and out[h0 + 2]["is_gap"]
    assert out[h0 + 3]["value_micro"] == 5_000_000 and not out[h0 + 3]["is_gap"]


def test_twa_gapfill_partitioning_invariance(spark):
    import datetime as dt

    from diagnosisextraction_ml_spark.operators.rollup import (
        gapfill_locf_hourly,
        time_weighted_avg_hourly,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (f"k{i % 4}", t0 + dt.timedelta(minutes=7 * i), float((i * 13) % 50))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    for op in (time_weighted_avg_hourly, gapfill_locf_hourly):
        a = sorted(map(tuple, op(df.coalesce(1), ["key"], "ts", "v").collect()))
        b = sorted(map(tuple, op(df.repartition(7), ["key"], "ts", "v").collect()))
        assert a == b and len(a) > 0


def test_gini_hand_cases(spark):
    from diagnosisextraction_ml_spark.operators.profile import gini_coefficient

    # perfect equality -> 0
    eq = spark.createDataFrame([(10.0,)] * 5, "v double")
    r = gini_coefficient(eq, "v", (0.0, 100.0)).collect()[0]
    assert r["n"] == 5 and r["gini_micro"] == 0
    # one holder of everything among n=5: G = (n-1)/n = 0.8
    conc = spark.createDataFrame([(0.0,)] * 4 + [(50.0,)], "v double")
    r = gini_coefficient(conc, "v", (0.0, 100.0)).collect()[0]
    assert r["gini_micro"] == 800_000
    # textbook small case: [1,2,3,4] -> G = 2*(1*1+2*2+3*3+4*4)/(4*10) - 5/4 = 0.25
    sm = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "v double")
    r = gini_coefficient(sm, "v", (0.0, 10.0)).collect()[0]
    assert r["gini_micro"] == 250_000
    # ties collapse exactly + partition invariance
    t = spark.createDataFrame([(1.0,), (1.0,), (3.0,), (3.0,)], "v double")
    a = gini_coefficient(t.coalesce(1), "v", (0.0, 10.0)).collect()[0]
    b = gini_coefficient(t.repartition(5), "v", (0.0, 10.0)).collect()[0]
    assert a["gini_micro"] == b["gini_micro"] == 250_000


def test_cusum_overflow_raises_not_nulls(spark):
    from diagnosisextraction_ml_spark.operators.rollup import cusum_drift

    # A running micro-unit sum past int64 must FAIL LOUDLY (matching
    # the DuckDB twin's CAST(.. AS BIGINT) error), not silently NULL
    # through Spark's non-ANSI decimal->long cast.
    big = 9_300_000_000_000  # 9.3e12 * 1e6 deviation overflows int64
    rows = [("k", 0, 0), ("k", 1, 2 * big)]
    df = spark.createDataFrame(rows, "key string, t int, v long")
    with pytest.raises(Exception, match="overflows BIGINT"):
        cusum_drift(df, ["key"], "t", "v", 10**6).collect()


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    rng_rows = [
        (float(i), float(i) * 2.0 + 1.0, float((i * 7) % 5), 3.0)
        for i in range(40)
    ]
    df = spark.createDataFrame(rng_rows, "a double, b double, c double, d double")
    from diagnosisextraction_ml_spark.operators.profile import corr_matrix

    got = {
        (r["col_a"], r["col_b"]): r["r"]
        for r in corr_matrix(df, ["a", "b", "c", "d"]).collect()
    }
    x = np.asarray([list(r) for r in rng_rows])
    assert got[("a", "b")] == 1.0  # exact linear relation
    want_ac = float(np.corrcoef(x[:, 0], x[:, 2])[0, 1])
    assert abs(got[("a", "c")] - want_ac) < 1e-6
    # zero-variance column -> NULL, not error
    assert got[("a", "d")] is None and got[("c", "d")] is None
    assert len(got) == 6


def test_target_encode_loo_hand_case(spark):
    from diagnosisextraction_ml_spark.operators.prep import target_encode_loo

    df = spark.createDataFrame(
        [(1, "x", 10.0), (2, "x", 20.0), (3, "x", 30.0), (4, "y", 7.0)],
        "id long, cat string, y double",
    )
    got = {r["id"]: r["loo_enc"] for r in target_encode_loo(df, "cat", "y", "id").collect()}
    assert got[1] == 25.0 and got[2] == 20.0 and got[3] == 15.0
    assert got[4] is None  # singleton category has no LOO peers


def test_quantile_normalize_by_group_ties_and_singletons(spark):
    from diagnosisextraction_ml_spark.operators.profile import (
        quantile_normalize_by_group,
    )

    df = spark.createDataFrame(
        [(1, "g", 5), (2, "g", 5), (3, "g", 7), (4, "g", 9), (5, "h", 1)],
        "id long, grp string, v long",
    )
    got = {
        r["id"]: r["pct_micro"]
        for r in quantile_normalize_by_group(df, "v", "grp", "id").collect()
    }
    # strictly-below convention over n-1=3: ties share a rank
    assert got[1] == 0 and got[2] == 0
    assert got[3] == 1000000 * 2 // 3
    assert got[4] == 1000000  # max value: all 3 others below
    assert got[5] is None  # single-row group


def test_seasonal_naive_backtest_hand_case(spark):
    from diagnosisextraction_ml_spark.operators.rollup import (
        seasonal_naive_backtest,
    )

    base = 1_700_000_000  # aligned hours
    rows = []
    # key 'a': hour sums 10, 20 on day 1; 15, 20 on day 2
    for h, v in ((0, 10.0), (1, 20.0), (24, 15.0), (25, 20.0)):
        rows.append((len(rows), base + h * 3600 + 30, "a", v))
    df = spark.createDataFrame(
        rows, "event_id long, es long, event_type string, value double"
    ).select(
        "event_id",
        F.col("es").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )
    out = {r["key"]: (r["n_hours"], r["mape"]) for r in seasonal_naive_backtest(df).collect()}
    # APEs: |15-10|/15 = 1/3 -> 0.333333 ; |20-20|/20 = 0
    n, mape = out["a"]
    assert n == 2
    assert abs(mape - (0.333333 + 0.0) / 2) < 1e-9


def test_quantile_normalize_matches_pandas_rank(spark):
    """Seeded random values with heavy ties: pct_micro must equal the
    pandas 'strictly below / (n-1)' rank in every group."""
    import random

    import pandas as pd

    from diagnosisextraction_ml_spark.operators.profile import (
        quantile_normalize_by_group,
    )

    rng = random.Random(7)
    rows = [
        (i, f"g{rng.randrange(3)}", rng.randrange(6)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v long")
    got = {
        r["id"]: r["pct_micro"]
        for r in quantile_normalize_by_group(df, "v", "grp", "id").collect()
    }
    pdf = pd.DataFrame(rows, columns=["id", "grp", "v"])
    for grp, g in pdf.groupby("grp"):
        n = len(g)
        for _, row in g.iterrows():
            below = int((g["v"] < row["v"]).sum())
            want = (1_000_000 * below) // (n - 1) if n > 1 else None
            assert got[row["id"]] == want, (grp, row["v"])


def test_seasonal_naive_backtest_pre_epoch_timestamps(spark):
    """Negative-epoch timestamps bucket by floor (like the oracle's
    floor(epoch/3600)), not truncation toward zero: an event 30 min
    BEFORE the epoch lands in hour -1, not hour 0."""
    from diagnosisextraction_ml_spark.operators.rollup import (
        seasonal_naive_backtest,
    )

    rows = []
    # key 'p': two cycle-1 hours at -24, -23; cycle-2 repeats at 0, 1.
    # Offsets of +1800s sit mid-hour; floor keeps them in their hour,
    # truncation would shift the negative ones up one bucket.
    for h, v in ((-24, 10.0), (-23, 40.0), (0, 20.0), (1, 40.0)):
        rows.append((len(rows), h * 3600 + 1800, "p", v))
    df = spark.createDataFrame(
        rows, "event_id long, es long, event_type string, value double"
    ).select(
        "event_id",
        F.col("es").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )
    out = {
        r["key"]: (r["n_hours"], r["mape"])
        for r in seasonal_naive_backtest(df).collect()
    }
    # forecasts: hour 0 <- hour -24 (10 vs 20 -> APE 0.5),
    #            hour 1 <- hour -23 (40 vs 40 -> APE 0)
    n, mape = out["p"]
    assert n == 2
    assert abs(mape - 0.25) < 1e-9
