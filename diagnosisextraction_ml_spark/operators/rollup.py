"""Continuous aggregates — incremental rollup maintenance.

North-star extension (no reference counterpart): the "hypertable
continuous aggregate" pattern. A time-bucketed rollup (hour × type →
count/sum) is maintained *incrementally*: each new batch is rolled up
alone — touching only the batch — and merged into the stored state by
adding counters. History is never rescanned; that is the entire value
of the pattern at 100 TB.

Correct-by-algebra: every measure kept in the state table must be a
commutative monoid (count, sum, min, max — NOT avg; store sum+count
and divide at read time). Then ``merge(rollup(a), rollup(b)) ==
rollup(a ∪ b)`` exactly, which is what the oracle entry checks.

Float caveat, handled: double sums are order-dependent across
engines/partitionings, so the state keeps sums as ``DECIMAL(30,6)``
(exact, associative) and read-time views cast back to double — the
same convention as the engine's other oracle-exact aggregations
(plans/queries.py module docstring).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# element cast matches the engine-wide oracle convention (DECIMAL(18,6)
# for event values — see plans/queries.py); sums get headroom.
VAL_DECIMAL = "decimal(18,6)"
SUM_DECIMAL = "decimal(30,6)"


def hourly_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dims: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Roll one batch up to (hour, dims) grain — one map-side-combined
    groupBy; output is state-table schema: n (long), sum_value
    (decimal), plus min/max over the hour."""
    dims = list(dims)
    return (
        events.select(
            F.date_trunc("hour", F.col(ts_col)).alias("window_start"),
            *dims,
            F.col(value_col).cast(VAL_DECIMAL).alias("__v"),
        )
        .groupBy("window_start", *dims)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__v").cast(SUM_DECIMAL).alias("sum_value"),
            F.min("__v").cast(SUM_DECIMAL).alias("min_value"),
            F.max("__v").cast(SUM_DECIMAL).alias("max_value"),
        )
    )


def merge_rollup(
    state: DataFrame, batch_rollup: DataFrame, dims: Sequence[str] = ("event_type",)
) -> DataFrame:
    """Fold a batch's rollup into the state table (monoid merge).

    Both inputs carry the :func:`hourly_rollup` schema. One groupBy
    over ``state ∪ batch``; since both sides are already at rollup
    grain, the Exchange carries ≤ |state grain| + |batch grain| rows —
    never event-level data. With the state stored bucketed on the
    grain key, only the (tiny) batch side shuffles.
    """
    dims = list(dims)
    keys = ["window_start", *dims]
    combined = state.select(
        *keys, "n", "sum_value", "min_value", "max_value"
    ).unionByName(batch_rollup.select(*keys, "n", "sum_value", "min_value", "max_value"))
    return combined.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_value").cast(SUM_DECIMAL).alias("sum_value"),
        F.min("min_value").cast(SUM_DECIMAL).alias("min_value"),
        F.max("max_value").cast(SUM_DECIMAL).alias("max_value"),
    )
