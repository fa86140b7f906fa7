"""Association rules, triangle counting, table checksums."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from diagnosisextraction_ml_spark.functions.hashing import md5_hash64
from diagnosisextraction_ml_spark.operators import assoc, profile


def _tx(spark, baskets):
    rows = [(t, i) for t, items in baskets for i in items]
    return spark.createDataFrame(rows, "tx long, item long")


def test_association_rules_hand_case(spark):
    # {1,2} together in 3 of 4 baskets; 1 alone once
    baskets = [(10, [1, 2]), (11, [1, 2]), (12, [1, 2, 3]), (13, [1, 3])]
    out = {
        (r["antecedent"], r["consequent"]): r
    for r in assoc.association_rules(
            _tx(spark, baskets), "tx", "item", min_pair_support=2
        ).collect()
    }
    r12 = out[(1, 2)]
    assert (r12["pair_count"], r12["ante_count"], r12["cons_count"], r12["n_tx"]) == (
        3,
        4,
        3,
        4,
    )
    assert r12["conf_micro"] == (1_000_000 * 3) // 4  # P(2|1) = 0.75
    assert r12["lift_micro"] == (1_000_000 * 3 * 4) // (4 * 3)  # lift = 1.0
    r21 = out[(2, 1)]
    assert r21["conf_micro"] == 1_000_000  # every basket with 2 has 1
    assert (1, 3) in out and (3, 1) in out
    # support-1 pair {2,3} filtered by min_pair_support=2
    assert (2, 3) not in out


def test_association_rules_brute_force(spark):
    import random

    rng = random.Random(7)
    baskets = [
        (t, sorted(rng.sample(range(12), rng.randint(2, 5)))) for t in range(40)
    ]
    got = {
        (r["antecedent"], r["consequent"]): (
            r["pair_count"],
            r["conf_micro"],
            r["lift_micro"],
        )
        for r in assoc.association_rules(
            _tx(spark, baskets), "tx", "item", min_pair_support=2
        ).collect()
    }
    from collections import Counter

    item_c = Counter(i for _, items in baskets for i in set(items))
    pair_c = Counter(
        p for _, items in baskets for p in combinations(sorted(set(items)), 2)
    )
    n = len(baskets)
    want = {}
    for (a, b), c in pair_c.items():
        if c >= 2:
            for x, y in [(a, b), (b, a)]:
                want[(x, y)] = (
                    c,
                    (1_000_000 * c) // item_c[x],
                    (1_000_000 * c * n) // (item_c[x] * item_c[y]),
                )
    assert got == want


def test_triangle_count_hand_graphs(spark):
    def count(edge_list):
        edges = spark.createDataFrame(edge_list, "src long, dst long")
        return assoc.triangle_count(edges).collect()[0]["n_triangles"]

    # K4 has 4 triangles; duplicate/reversed edges must not change it
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    assert count(k4) == 4
    assert count(k4 + [(b, a) for a, b in k4]) == 4
    # a 5-cycle has none; adding one chord creates exactly one
    c5 = [(i, (i + 1) % 5) for i in range(5)]
    assert count(c5) == 0
    assert count(c5 + [(0, 2)]) == 1
    # self-loops ignored
    assert count(k4 + [(1, 1), (2, 2)]) == 4


def test_triangle_count_partitioning_invariant(spark):
    import random

    rng = random.Random(3)
    edge_list = list({(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(200)})
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    a = assoc.triangle_count(edges.repartition(1)).collect()[0]["n_triangles"]
    b = assoc.triangle_count(edges.repartition(11)).collect()[0]["n_triangles"]
    assert a == b > 0


def test_basket_pairs_max_basket_cap(spark):
    baskets = [(1, list(range(10))), (2, [1, 2])]
    out = assoc.basket_pairs(_tx(spark, baskets), "tx", "item", max_basket=5).collect()
    assert {(r["tx"], r["item_a"], r["item_b"]) for r in out} == {(2, 1, 2)}


def test_table_checksum_order_independent_and_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, s string"
    )
    h = md5_hash64(F.expr("concat_ws('|', CAST(id AS STRING), s)"))
    base = profile.table_checksum(df, "t", h).collect()[0]
    assert base["n_rows"] == 3 and base["table_name"] == "t"
    # partitioning does not change the fingerprint
    shuffled = profile.table_checksum(df.repartition(7), "t", h).collect()[0]
    assert shuffled["xor_checksum"] == base["xor_checksum"]
    # a one-character change does
    df2 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "C")], "id long, s string")
    changed = profile.table_checksum(df2, "t", h).collect()[0]
    assert changed["xor_checksum"] != base["xor_checksum"]
    # incremental maintenance: xor of batch fingerprints == full fingerprint
    b1 = profile.table_checksum(df.filter("id <= 1"), "t", h).collect()[0]
    b2 = profile.table_checksum(df.filter("id > 1"), "t", h).collect()[0]
    assert b1["xor_checksum"] ^ b2["xor_checksum"] == base["xor_checksum"]


def test_table_checksum_empty_table(spark):
    df = spark.createDataFrame([], "id long, s string")
    h = md5_hash64(F.expr("concat_ws('|', CAST(id AS STRING), s)"))
    row = profile.table_checksum(df, "empty", h).collect()[0]
    assert (row["n_rows"], row["xor_checksum"]) == (0, 0)


@pytest.mark.slow
def test_triangle_doulion_full_keep_equals_exact(spark):
    # p = 1 keeps every edge: the "estimate" must equal the exact count
    # on any graph (sampled-count path == exact path end to end).
    import random

    rng = random.Random(7)
    edges = list({tuple(sorted(rng.sample(range(30), 2))) for _ in range(150)})
    df = spark.createDataFrame(edges, "src long, dst long")
    exact = assoc.triangle_count(df).collect()[0]["n_triangles"]
    row = assoc.triangle_count_sampled(df, keep_num=1, keep_den=1).collect()[0]
    assert row["n_triangles_sampled"] == exact
    assert row["n_triangles_est"] == exact
    assert row["n_sampled_edges"] == len(edges)


@pytest.mark.slow
def test_triangle_doulion_deterministic_and_unbiased_ballpark(spark):
    # md5-coin sampling: identical result at any partitioning, and the
    # p^-3 blow-up lands within a loose factor of the exact count on a
    # triangle-rich graph (DOULION's 1/sqrt(T) error at modest T).
    from itertools import combinations as combs

    edges = [(a, b) for a, b in combs(range(24), 2)]  # K24: 2024 triangles
    df = spark.createDataFrame(edges, "src long, dst long")
    a = assoc.triangle_count_sampled(df.coalesce(1), keep_num=1, keep_den=2)
    b = assoc.triangle_count_sampled(df.repartition(16), keep_num=1, keep_den=2)
    ra, rb = a.collect()[0], b.collect()[0]
    assert tuple(ra) == tuple(rb)
    exact = assoc.triangle_count(df).collect()[0]["n_triangles"]
    assert exact == 2024
    assert 0.5 * exact <= ra["n_triangles_est"] <= 1.5 * exact


def test_triangle_doulion_rejects_bad_rate(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        assoc.triangle_count_sampled(df, keep_num=3, keep_den=2)
    with pytest.raises(ValueError):
        assoc.triangle_count_sampled(df, keep_num=0, keep_den=2)
