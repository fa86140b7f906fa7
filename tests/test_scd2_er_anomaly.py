"""SCD2 history, blocked fuzzy ER pairs, trailing-window anomaly."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from diagnosisextraction_ml_spark.operators import joins, rollup, upsert


def _ts(day):
    return dt.datetime(2024, 1, day)


def test_scd2_hand_case(spark):
    feed = spark.createDataFrame(
        [
            (1, "A", _ts(1), 10),
            (1, "A", _ts(2), 11),
            (1, "B", _ts(3), 12),
            (1, "A", _ts(5), 13),  # returns to A: a NEW run, not merged
            (2, "C", _ts(4), 14),
        ],
        "k long, state string, ts timestamp, ev long",
    )
    out = upsert.scd2_history(feed, ["k"], "state", "ts", ["ev"]).collect()
    rows = {(r["k"], r["run_id"]): r for r in out}
    assert len(out) == 4
    r1 = rows[(1, 1)]
    assert (r1["state"], r1["valid_from"], r1["valid_to"], r1["n_obs"]) == (
        "A",
        _ts(1),
        _ts(3),
        2,
    )
    r2 = rows[(1, 2)]
    assert (r2["state"], r2["valid_to"], r2["is_current"]) == ("B", _ts(5), False)
    r3 = rows[(1, 3)]
    assert (r3["state"], r3["valid_to"], r3["is_current"]) == ("A", None, True)
    assert rows[(2, 1)]["is_current"] is True


def test_scd2_equal_ts_tiebreak_deterministic(spark):
    # two states at the same instant: the higher event id wins the instant's
    # run ordering via the tiebreak, identically at any partitioning
    feed = spark.createDataFrame(
        [(1, "X", _ts(1), 2), (1, "Y", _ts(1), 1)],
        "k long, state string, ts timestamp, ev long",
    )
    a = upsert.scd2_history(feed.repartition(1), ["k"], "state", "ts", ["ev"]).collect()
    b = upsert.scd2_history(feed.repartition(7), ["k"], "state", "ts", ["ev"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    cur = [r for r in a if r["is_current"]]
    assert [r["state"] for r in cur] == ["X"]  # ev=2 is the later observation


def test_scd2_intervals_partition_timeline(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = upsert.scd2_history(
        orders.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"),
        ["o_custkey"],
        "o_orderpriority",
        "o_orderdate",
        ["o_orderkey"],
    )
    # exactly one current row per customer; valid_to of run i == valid_from
    # of run i+1 (half-open, gap-free)
    per_key = out.groupBy("o_custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur")
    )
    assert per_key.filter(F.col("n_cur") != 1).count() == 0
    joined = out.alias("a").join(
        out.alias("b"),
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.run_id") + 1 == F.col("b.run_id")),
    )
    assert joined.filter(F.col("a.valid_to") != F.col("b.valid_from")).count() == 0


def test_er_pairs_brute_force_equivalence(spark):
    names = [(i, f"rec-{i:04d}") for i in range(80)]
    df = spark.createDataFrame(names, "id long, name string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in joins.blocked_fuzzy_pairs(
            df, "id", "name", [], prefix_len=7, max_dist=1, max_block=200
        ).collect()
    }

    def lev(a, b):

        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[n]

    want = set()
    for i, na in names:
        for j, nb in names:
            if j > i and na[:7] == nb[:7] and lev(na, nb) <= 1:
                want.add((i, j, lev(na, nb)))
    assert got == want
    assert got  # non-vacuous


def test_er_max_block_caps_hot_block(spark):
    # one boilerplate name shared by 50 records would be quadratic;
    # with max_block=10 that block is dropped entirely
    rows = [(i, "same-name") for i in range(50)] + [(100, "abcd"), (101, "abce")]
    df = spark.createDataFrame(rows, "id long, name string")
    out = joins.blocked_fuzzy_pairs(
        df, "id", "name", [], prefix_len=3, max_dist=1, max_block=10
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(100, 101)}


def test_anomaly_flags_injected_spike(spark):
    # flat series of 10/hour, one hour spikes to 100
    rows = [("a", h, 100 if h == 40 else 10) for h in range(60)]
    df = spark.createDataFrame(rows, "k string, hr long, cnt long")
    out = rollup.trailing_anomaly(
        df, ["k"], "hr", "cnt", trailing=24, min_points=12, k=3
    )
    flagged = [r["hr"] for r in out.filter("is_anomaly").collect()]
    assert flagged == [40]
    # the spike hour's stats are exact integers
    r40 = out.filter("hr = 40").collect()[0]
    assert r40["dev2"] > r40["bound"] >= 0


def test_anomaly_quiet_until_min_points(spark):
    # a spike in the warm-up window (n_win < min_points) is not tested
    rows = [("a", h, 100 if h == 3 else 10) for h in range(30)]
    df = spark.createDataFrame(rows, "k string, hr long, cnt long")
    out = rollup.trailing_anomaly(
        df, ["k"], "hr", "cnt", trailing=24, min_points=12, k=3
    )
    assert out.filter("is_anomaly AND hr = 3").count() == 0


def test_anomaly_range_window_respects_gaps(spark):
    # hours 0..9 then a gap to hour 100: the window at hr=100 must NOT
    # reach back across the gap (RANGE, not ROWS)
    rows = [("a", h, 10) for h in range(10)] + [("a", 100, 99)]
    df = spark.createDataFrame(rows, "k string, hr long, cnt long")
    out = {r["hr"]: r for r in rollup.trailing_anomaly(
        df, ["k"], "hr", "cnt", trailing=24, min_points=12, k=3
    ).collect()}
    assert out[100]["n_win"] == 1
    assert not out[100]["is_anomaly"]
