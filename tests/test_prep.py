"""P2/P3, A1, V1-V7 — prep operator tests (determinism under
repartitioning is the load-bearing property at scale)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.operators.prep import (
    assign_folds,
    binarize_label,
    class_partition,
    downsample_to_balance,
    intersect_rows,
    merge_on_column,
    recode_label,
    split_train_test,
    subset_first_n,
    union_all,
)


def test_recode_and_binarize(spark):
    df = spark.createDataFrame([(1.0, True), (2.0, False)], "PATNR double, annotation boolean")
    out = binarize_label(recode_label(df)).collect()
    got = {r["PATNR"]: (r["Outcome"], r["label"]) for r in out}
    assert got == {1.0: ("y", 1), 2.0: ("n", 0)}


def test_merge_on_column(spark):
    df = spark.createDataFrame(
        [(1.0, True, "a"), (1.0, True, "b"), (2.0, False, "c")],
        "PATNR double, annotation boolean, text string",
    )
    rows = {r["PATNR"]: r for r in merge_on_column(df).collect()}
    assert rows[1.0]["Text"] == "a b"
    assert rows[2.0]["Text"] == "c"
    assert rows[1.0]["Outcome"] is True


def test_merge_deterministic_under_repartition(spark):
    rows = [(float(i % 10), i % 2 == 0, f"t{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "PATNR double, annotation boolean, text string")
    a = sorted(map(tuple, merge_on_column(df).collect()))
    b = sorted(map(tuple, merge_on_column(df.repartition(13)).collect()))
    assert a == b


def test_assign_folds_properties(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    out = assign_folds(df, "k", n_folds=5, rounds=2)
    rows = out.collect()
    # folds in range, both rounds present, deterministic under repartition
    assert all(0 <= r["fold_0"] < 5 and 0 <= r["fold_1"] < 5 for r in rows)
    again = sorted(map(tuple, assign_folds(df.repartition(7), "k", 5, 2).collect()))
    assert sorted(map(tuple, rows)) == again
    # roughly balanced
    counts = out.groupBy("fold_0").count().collect()
    assert all(140 < r["count"] < 260 for r in counts)


def test_split_train_test_partition(spark):
    df = spark.range(500).withColumnRenamed("id", "k")
    train, test = split_train_test(df, "k", test_frac=0.4)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 500
    assert train.intersect(test).count() == 0
    assert 130 < n_test < 270


def test_downsample_to_balance(spark):
    df = spark.range(1100).withColumn("label", (F.col("id") < 100).cast("int"))
    out = downsample_to_balance(df, "label", "id")
    counts = {r["label"]: r["count"] for r in out.groupBy("label").count().collect()}
    assert counts[1] == 100  # minority kept whole
    assert 70 <= counts[0] <= 130  # majority ~n_min (hash threshold is approximate)
    # deterministic at any parallelism
    again = downsample_to_balance(df.repartition(11), "label", "id")
    assert sorted(r["id"] for r in out.collect()) == sorted(r["id"] for r in again.collect())


def test_subset_union_intersect(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    sub = subset_first_n(df, "k", 10)
    assert sub.count() == 10
    assert sorted(map(tuple, subset_first_n(df.repartition(5), "k", 10).collect())) == sorted(
        map(tuple, sub.collect())
    )
    a = spark.createDataFrame([(1,), (2,)], "x int")
    b = spark.createDataFrame([(2,), (3,)], "x int")
    assert union_all([a, b]).count() == 4
    assert [r["x"] for r in intersect_rows(a, b).collect()] == [2]
    assert class_partition(a, "x", 1).count() == 1


def test_assign_folds_exact_shufflesplit_parity(spark, reference_dir):
    """V4 compat knob — assign_folds_exact replays sklearn ShuffleSplit
    (RandomState(seed).permutation sliced at ceil/floor boundaries)
    bit-for-bit on the 668-patient reference corpus, SEED=26062019.
    The expectation here is an independent driver-side replay of the
    published algorithm; the Spark path must broadcast-join the same
    membership back onto the rows."""
    import math

    import numpy as np

    from diagnosisextraction_ml_spark.operators.prep import assign_folds_exact
    from diagnosisextraction_ml_spark.sources.readers import read_patient_cache

    df = read_patient_cache(spark, f"{reference_dir}/sample_data/autocorrect_dummydata.csv")
    seed, n_splits = 26062019, 10
    out = assign_folds_exact(df, "PATNR", n_splits=n_splits, test_size=0.5, seed=seed)

    keys = [r[0] for r in df.select("PATNR").orderBy(F.col("PATNR").asc()).collect()]
    n = len(keys)
    assert n == 668
    n_test = int(math.ceil(0.5 * n))
    n_train = int(math.floor(0.5 * n))
    rng = np.random.RandomState(seed)
    expected = {k: ["none"] * n_splits for k in keys}
    for s in range(n_splits):
        perm = rng.permutation(n)
        for idx in perm[:n_test]:
            expected[keys[idx]][s] = "test"
        for idx in perm[n_test : n_test + n_train]:
            expected[keys[idx]][s] = "train"

    got = {
        r["PATNR"]: [r[f"split_{s}"] for s in range(n_splits)]
        for r in out.select("PATNR", *[f"split_{s}" for s in range(n_splits)]).collect()
    }
    assert got == expected
    # every split is a clean 334/334 partition of the corpus
    for s in range(n_splits):
        marks = [got[k][s] for k in keys]
        assert marks.count("test") == 334 and marks.count("train") == 334
    # deterministic under repartitioning (the broadcast map is order-free)
    again = assign_folds_exact(df.repartition(7), "PATNR", n_splits=n_splits, seed=seed)
    got2 = {
        r["PATNR"]: [r[f"split_{s}"] for s in range(n_splits)]
        for r in again.select("PATNR", *[f"split_{s}" for s in range(n_splits)]).collect()
    }
    assert got2 == expected


def test_assign_folds_exact_train_rule_matches_sklearn(spark):
    """sklearn ShuffleSplit (train_size=None): n_train = n - n_test, NOT
    floor((1-test_size)*n) — IEEE float makes those diverge, e.g.
    test_size=0.3, n=10: floor(0.7*10)=floor(6.999...)=6 vs sklearn's 7.
    Every row must be train or test here (no 'none')."""
    import numpy as np

    from diagnosisextraction_ml_spark.operators.prep import assign_folds_exact

    n, seed, test_size = 10, 7, 0.3
    df = spark.createDataFrame([(i,) for i in range(n)], "k int")
    out = assign_folds_exact(df, "k", n_splits=3, test_size=test_size, seed=seed)
    rows = {r["k"]: [r[f"split_{s}"] for s in range(3)] for r in out.collect()}

    n_test = int(np.ceil(test_size * n))
    n_train = n - n_test  # sklearn's rule; the old floor() gave 6
    assert (n_test, n_train) == (3, 7)
    rng = np.random.RandomState(seed)
    for s in range(3):
        perm = rng.permutation(n)
        expected = {int(i): "test" for i in perm[:n_test]}
        expected.update({int(i): "train" for i in perm[n_test : n_test + n_train]})
        got = {k: v[s] for k, v in rows.items()}
        assert got == expected
        assert "none" not in got.values()


def test_assign_folds_exact_rejects_duplicate_keys(spark):
    """Duplicate key values fan out the membership join and make the
    sklearn index mapping ambiguous — must fail loudly."""
    import pytest

    from diagnosisextraction_ml_spark.operators.prep import assign_folds_exact

    df = spark.createDataFrame([(1,), (2,), (2,)], "k int")
    with pytest.raises(ValueError, match="unique"):
        assign_folds_exact(df, "k", n_splits=2)


def test_shuffle_rows_content_key_is_injective(spark):
    """The content-addressed order key must distinguish ('a', NULL) from
    ('a␟x',)-style collisions: rows that differ only in NULL placement
    or contain the old separator char get distinct sort keys, so the
    order is stable across partitionings."""
    from diagnosisextraction_ml_spark.operators.prep import shuffle_rows

    rows = [("a", None), ("a", ""), ("a␟b", None), ("a", "␟b"), ("x", "y")]
    df = spark.createDataFrame(rows, "c1 string, c2 string")
    a = [tuple(r) for r in shuffle_rows(df, seed=1).collect()]
    b = [tuple(r) for r in shuffle_rows(df.repartition(5), seed=1).collect()]
    assert a == b
    assert sorted(a, key=lambda t: (t[0], t[1] or "")) == sorted(
        rows, key=lambda t: (t[0], t[1] or "")
    )


def test_stratified_sample_exact_counts_and_determinism(spark):
    """ceil(n_s/4) rows per stratum, identical picks on any
    partitioning, and picks equal the naive per-stratum hash rank."""
    from diagnosisextraction_ml_spark.functions.hashing import md5_hash64
    from diagnosisextraction_ml_spark.operators.prep import stratified_sample_exact
    from pyspark.sql import Window, functions as F

    rows = [(i, f"s{i % 3}") for i in range(101)]
    df = spark.createDataFrame(rows, "k long, stratum string")
    out = stratified_sample_exact(df, "stratum", "k", num=1, den=4)
    got = sorted((r["stratum"], r["k"]) for r in out.collect())

    counts = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    by_stratum = {}
    for s, k in got:
        by_stratum[s] = by_stratum.get(s, 0) + 1
    for s, n in counts.items():
        assert by_stratum[s] == -(-n // 4)  # ceil

    again = sorted(
        (r["stratum"], r["k"])
        for r in stratified_sample_exact(df.repartition(7), "stratum", "k", 1, 4).collect()
    )
    assert again == got

    w = Window.partitionBy("stratum").orderBy(md5_hash64(F.col("k").cast("string")), "k")
    naive = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("stratum")))
        .filter(F.col("rn") <= F.expr("(n * 1 + 3) div 4"))
    )
    assert sorted((r["stratum"], r["k"]) for r in naive.collect()) == got


def test_mixture_resample_multiplicity_and_determinism(spark):
    """Exact per-key multiplicity: floor(num/den) + (md5(key) % den <
    num % den); zero-weight groups drop; stable under repartition."""
    from diagnosisextraction_ml_spark.operators.prep import mixture_resample

    rows = [(i, f"g{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "k long, g string")
    weights = {"g0": (2, 1), "g1": (3, 2), "g2": (0, 1)}
    out = mixture_resample(df, "g", "k", weights).collect()

    import hashlib

    def h60(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)

    expect = {}
    for k, g in rows:
        nu, de = weights.get(g, (1, 1))
        n = nu // de + (1 if h60(k) % de < nu % de else 0)
        if n:
            expect[k] = n
    got = {}
    for r in out:
        got[r["k"]] = got.get(r["k"], 0) + 1
    assert got == expect
    assert all(r["g"] != "g2" for r in out)
    copies = sorted(r["copy_idx"] for r in out if r["k"] == 0)
    assert copies == list(range(1, expect[0] + 1))

    again = mixture_resample(df.repartition(7), "g", "k", weights).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


# ---------------------------------------------------------------------------
# weighted_sample_es
# ---------------------------------------------------------------------------


def test_weighted_sample_es_favors_heavy_weights(spark):
    from diagnosisextraction_ml_spark.operators.prep import weighted_sample_es

    rows = [(i, 10.0 if i < 500 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample_es(df, "w", k=100).collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r.doc_id < 500)
    assert heavy >= 70  # 10:1 weights → heavy class dominates


def test_weighted_sample_es_deterministic_and_filters_nonpositive(spark):
    from diagnosisextraction_ml_spark.operators.prep import weighted_sample_es

    rows = [(i, float(i % 7) - 1.0) for i in range(300)]  # some ≤ 0
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = [tuple(r) for r in weighted_sample_es(df.repartition(7), "w", k=40).collect()]
    b = [tuple(r) for r in weighted_sample_es(df.coalesce(1), "w", k=40).collect()]
    assert a == b
    assert all(r[1] > 0 for r in a)


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights
# ---------------------------------------------------------------------------

def test_temperature_mixture_alpha_extremes(spark):
    from diagnosisextraction_ml_spark.operators.prep import temperature_mixture_plan

    rows = [("a",)] * 900 + [("b",)] * 90 + [("c",)] * 10
    df = spark.createDataFrame(rows, "src string")
    # alpha=1: proportional weights
    prop = {r["group"]: r for r in temperature_mixture_plan(df, "src", alpha=1.0).collect()}
    assert prop["a"]["weight_micro"] == 900_000
    assert prop["b"]["weight_micro"] == 90_000
    assert prop["c"]["weight_micro"] == 10_000
    # alpha=0: uniform (each source weight 1/3)
    uni = {r["group"]: r for r in temperature_mixture_plan(df, "src", alpha=0.0).collect()}
    assert all(v["weight_micro"] == 333_333 for v in uni.values())


def test_temperature_mixture_rates_and_cap(spark):
    from diagnosisextraction_ml_spark.operators.prep import temperature_mixture_plan

    rows = [("big",)] * 1000 + [("small",)] * 10
    df = spark.createDataFrame(rows, "src string")
    out = {
        r["group"]: r
        for r in temperature_mixture_plan(
            df, "src", alpha=0.5, target_rows=200
        ).collect()
    }
    # w ∝ sqrt(n): big ~ sqrt(1000)=31.62, small ~ sqrt(10)=3.162 -> 10:1
    assert out["big"]["weight_micro"] == pytest.approx(909_090, abs=10)
    assert out["small"]["weight_micro"] == pytest.approx(90_909, abs=10)
    # rates: big: 200*0.909/1000 = 0.1818; small: 200*0.0909/10 = 1.818 -> capped
    assert out["big"]["rate_micro"] == pytest.approx(181_818, abs=10)
    assert out["small"]["rate_micro"] == 1_000_000
    # invariant: expected sampled rows <= target (cap bites on 'small')
    exp_rows = sum(v["rate_micro"] / 1e6 * v["n"] for v in out.values())
    assert exp_rows <= 200.01


def test_temperature_mixture_feeds_resample(spark):
    """rate_micro/1e6 pairs drive mixture_resample to the target size."""
    from diagnosisextraction_ml_spark.operators.prep import (
        mixture_resample,
        temperature_mixture_plan,
    )

    rows = [(f"id{i}", "a" if i < 800 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id string, src string")
    plan = temperature_mixture_plan(df, "src", alpha=0.5, target_rows=400)
    weights = {
        r["group"]: (int(r["rate_micro"]), 1_000_000) for r in plan.collect()
    }
    sampled = mixture_resample(df, "src", "doc_id", weights)
    n = sampled.count()
    assert 300 < n <= 450  # hash-thresholded realization of ~400
    # deterministic under repartitioning
    again = mixture_resample(df.repartition(7), "src", "doc_id", weights).count()
    assert n == again


def test_temperature_mixture_alpha_validation(spark):
    from diagnosisextraction_ml_spark.operators.prep import temperature_mixture_plan

    df = spark.createDataFrame([("a",)], "src string")
    with pytest.raises(ValueError):
        temperature_mixture_plan(df, "src", alpha=1.5)
