"""Temporal joins — as-of semantics on hand-built data + plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.operators.joins import asof_join


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", 10),   # before any right row -> null
            (2, "u1", 20),   # exactly at right ts 20 -> inclusive match
            (3, "u1", 25),   # between 20 and 30 -> carries 20's value
            (4, "u1", 35),   # after 30 -> carries 30's value
            (5, "u2", 50),   # other key: only u2's rights visible
            (6, "u3", 50),   # key with no right rows at all -> null
        ],
        "event_id long, user_id string, ts long",
    )
    right = spark.createDataFrame(
        [
            ("u1", 20, 200.0),
            ("u1", 30, 300.0),
            ("u2", 40, 400.0),
        ],
        "user_id string, ts long, value double",
    )
    out = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, on=["user_id"], value_cols=["value"]).collect()
    }
    assert out == {1: None, 2: 200.0, 3: 200.0, 4: 300.0, 5: 400.0, 6: None}


def test_asof_join_single_exchange_no_join(spark):
    """The union-and-carry plan has no join operator at all and exactly
    one Exchange (the window partitioning) — the property that makes it
    scale where a range-predicate join would go nested-loop."""
    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.col("id").alias("ts"),
    )
    right = spark.range(10).select(
        (F.col("id") % 7).alias("user_id"),
        (F.col("id") * 9).alias("ts"),
        (F.col("id") * 1.0).alias("value"),
    )
    plan = asof_join(left, right, on=["user_id"], value_cols=["value"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange") == 1


def test_asof_join_deterministic_under_repartition(spark):
    left = spark.range(500).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 11).alias("user_id"),
        (F.col("id") * 3).alias("ts"),
    )
    right = spark.range(50).select(
        (F.col("id") % 11).alias("user_id"),
        (F.col("id") * 17).alias("ts"),
        (F.col("id") * 1.0).alias("value"),
    )
    a = sorted(
        map(tuple, asof_join(left, right, ["user_id"], ["value"]).collect())
    )
    b = sorted(
        map(
            tuple,
            asof_join(left.repartition(13), right.repartition(3), ["user_id"], ["value"]).collect(),
        )
    )
    assert a == b


def test_interval_join_matches_bruteforce(spark):
    from diagnosisextraction_ml_spark.operators.joins import interval_join

    points = spark.range(200).select(
        F.col("id").alias("pid"),
        (F.col("id") % 5).alias("k"),
        (F.col("id") * 7 % 400).alias("es"),
    )
    intervals = spark.range(30).select(
        (F.col("id")).alias("iid"),
        (F.col("id") % 5).alias("k"),
        (F.col("id") * 13 % 300).alias("s"),
        (F.col("id") * 13 % 300 + 45).alias("e"),
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, ["k"], "es", "s", "e", bucket_width=32
        ).collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in points.join(intervals, "k")
        .filter((F.col("es") >= F.col("s")) & (F.col("es") < F.col("e")))
        .collect()
    )
    assert got == want and len(got) > 0


def test_interval_join_is_equi_join(spark):
    """Bucketization turns the range predicate into a hash equi-join —
    no nested-loop/cartesian in the plan."""
    from diagnosisextraction_ml_spark.operators.joins import interval_join

    points = spark.range(10).select(
        F.col("id").alias("pid"), (F.col("id") % 2).alias("k"), F.col("id").alias("es")
    )
    intervals = spark.range(4).select(
        F.col("id").alias("iid"),
        (F.col("id") % 2).alias("k"),
        F.col("id").alias("s"),
        (F.col("id") + 3).alias("e"),
    )
    plan = interval_join(points, intervals, ["k"], "es", "s", "e", 4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_asof_join_matches_bruteforce_randomized(spark):
    """Seeded pseudo-random data with engineered collisions (left ts
    equal to right ts, sparse keys): asof_join must equal the brute
    force 'max right.ts <= left.ts per key' join."""
    left = spark.range(400).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 7 % 13).alias("k"),
        (F.col("id") * 31 % 97).alias("es"),
    )
    right = spark.range(60).select(
        (F.col("id") * 5 % 13).alias("k"),
        (F.col("id") * 11 % 97).alias("rs"),
        (F.col("id") * 1.0).alias("value"),
    )
    # unique (k, rs) with deterministic winner, as the operator requires
    from pyspark.sql import Window

    w = Window.partitionBy("k", "rs").orderBy(F.col("value").asc())
    right = right.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")

    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(
            left, right.withColumnRenamed("rs", "ts"), ["k"], ["value"], left_ts="es"
        ).collect()
    }
    brute = (
        left.join(right, on=[left["k"] == right["k"], F.col("rs") <= F.col("es")], how="left")
        .groupBy("event_id")
        .agg(F.max_by("value", F.col("rs")).alias("v"))
    )
    want = {r["event_id"]: r["v"] for r in brute.collect()}
    assert got == want and any(v is not None for v in want.values())


def test_salted_join_equals_plain_join(spark):
    from diagnosisextraction_ml_spark.operators.joins import salted_join

    # one hot key (0) with 200 rows, a cold tail, plus unmatched keys
    left = spark.createDataFrame(
        [(i, 0 if i < 200 else i % 7, float(i)) for i in range(260)],
        "rid long, k long, v double",
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(5)], "rk long, name string"
    )
    got = sorted(
        tuple(r)
        for r in salted_join(
            left, right, "k", "rk", salt_expr=F.col("rid"), salts=8
        ).collect()
    )
    want = sorted(
        tuple(r) for r in left.join(right, left["k"] == right["rk"]).collect()
    )
    assert got == want and len(got) > 200

    # left join keeps unmatched left rows exactly once
    got_l = sorted(
        tuple(r)
        for r in salted_join(
            left, right, "k", "rk", salt_expr=F.col("rid"), salts=4, how="left"
        ).collect()
    )
    want_l = sorted(
        tuple(r)
        for r in left.join(right, left["k"] == right["rk"], "left").collect()
    )
    assert got_l == want_l

    with pytest.raises(ValueError, match="only inner/left"):
        salted_join(left, right, "k", "rk", F.col("rid"), how="full")


@pytest.mark.slow
def test_salted_join_randomized_equivalence_with_nulls(spark):
    """Seeded random draws incl. NULL keys: salted inner/left joins
    must equal the plain joins exactly (NULL keys never match, and
    left join keeps them once)."""
    import random

    from diagnosisextraction_ml_spark.operators.joins import salted_join

    rng = random.Random(42)
    for trial in range(3):
        left_rows = [
            (i, rng.choice([None, 0, 0, 0, 1, 2, 3, 99]), rng.random())
            for i in range(150)
        ]
        right_rows = [(k, f"d{k}") for k in range(4)]
        left = spark.createDataFrame(left_rows, "rid long, k long, v double")
        right = spark.createDataFrame(right_rows, "rk long, name string")
        for how in ("inner", "left"):
            got = sorted(
                tuple(r)
                for r in salted_join(
                    left, right, "k", "rk",
                    salt_expr=F.col("rid"), salts=rng.choice([2, 5, 16]),
                    how=how,
                ).collect()
            )
            want = sorted(
                tuple(r)
                for r in left.join(right, left["k"] == right["rk"], how).collect()
            )
            assert got == want, (trial, how)


def test_salted_join_nullable_salt_expr(spark):
    """A NULL salt source must not drop matching rows: pmod(NULL)
    coalesces to bucket 0, so the salted join stays exactly the plain
    join (inner drops nothing, left keeps every left row once)."""
    from diagnosisextraction_ml_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(i, i % 3, None if i % 4 == 0 else i, float(i)) for i in range(80)],
        "rid long, k long, salt_src long, v double",
    )
    right = spark.createDataFrame(
        [(k, f"d{k}") for k in range(2)], "rk long, name string"
    )
    for how in ("inner", "left"):
        got = sorted(
            tuple(r)
            for r in salted_join(
                left, right, "k", "rk",
                salt_expr=F.col("salt_src"), salts=8, how=how,
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in left.join(right, left["k"] == right["rk"], how).collect()
        )
        assert got == want, how
    # sanity: NULL-salt rows with matching keys exist in the fixture
    assert left.filter(F.col("salt_src").isNull() & F.col("k").isin(0, 1)).count() > 0
