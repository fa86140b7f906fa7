"""Bucketed-table co-located join: the equi-join on the bucket key
must plan with zero Exchange operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from diagnosisextraction_ml_spark.sources.bucketed import read_table, write_bucketed_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed_table(orders, "orders_b", "o_orderkey", n_buckets=8)
    write_bucketed_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 8
    )

    a = read_table(spark, "orders_b")
    b = read_table(spark, "lineitem_b")
    joined = a.join(b, "o_orderkey").groupBy("o_orderkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    # disable broadcast so the join strategy itself is what's tested
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert "SortMergeJoin" in plan
        # result parity with the plain (shuffled) join
        plain = (
            orders.join(
                li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            )
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_q18_bucketed_agg_has_no_lineitem_shuffle(spark, sf_dir):
    """rel_q18_big_orders_bucketed's whole point: the full-fact
    groupBy(l_orderkey) must read pre-bucketed lineitem and aggregate
    with no Exchange below the aggregate (the join/top-k above it may
    shuffle the small sides)."""
    import pyspark.sql.functions as F

    from diagnosisextraction_ml_spark.plans.queries import (
        _bucketed_lineitem,
        queries,
    )

    li = _bucketed_lineitem(spark, sf_dir, n_buckets=8)
    agg = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__sq"))
        .filter(F.col("__sq") > 150)
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bucket-local aggregation
    assert "HashAggregate" in plan or "SortAggregate" in plan

    # end-to-end parity with the plain variant
    qs = queries()
    a = [tuple(r) for r in qs["rel_q18_big_orders"](spark, sf_dir).collect()]
    b = [tuple(r) for r in qs["rel_q18_big_orders_bucketed"](spark, sf_dir).collect()]
    assert a == b


def test_q17_bucketed_no_fact_exchange(spark, sf_dir):
    """rel_q17_small_qty_revenue_bucketed: both partkey-keyed fact
    reads (per-part average + probe) must plan bucket-local — no
    hash-partitioning Exchange anywhere (the final one-row reduce's
    SinglePartition exchange is the only one allowed)."""
    from diagnosisextraction_ml_spark.plans.queries import queries

    qs = queries()
    df = qs["rel_q17_small_qty_revenue_bucketed"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    # parity with the plain variant
    a = [tuple(r) for r in qs["rel_q17_small_qty_revenue"](spark, sf_dir).collect()]
    b = [tuple(r) for r in df.collect()]
    assert a == b


def test_q8_bucketed_no_lineitem_exchange(spark, sf_dir):
    """rel_q8_market_share_bucketed: the fact side of the big join
    reads pre-bucketed lineitem — zero l_orderkey exchanges anywhere
    in the plan — and matches the plain variant row-for-row."""
    from diagnosisextraction_ml_spark.plans.queries import queries

    qs = queries()
    df = qs["rel_q8_market_share_bucketed"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(l_orderkey") == 0
    a = sorted(map(tuple, qs["rel_q8_market_share"](spark, sf_dir).collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b
