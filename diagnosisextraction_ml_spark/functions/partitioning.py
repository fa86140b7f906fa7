"""CPU-packing for narrow scans.

Per-row text work (tokenize / regex / shingle / hash) runs at the
INPUT's parallelism — Spark only re-distributes at the first shuffle.
A small single-file parquet scan (one row group → one split, however
low ``openCostInBytes`` goes) therefore pins all pre-shuffle CPU to
1-2 cores of a 32-core session. ``fan_out`` round-robins such inputs
up to the session's parallelism before the heavy projection.

Scale posture: this is explicitly a SMALL-INPUT fix. It no-ops for
any input already at or above ``defaultParallelism`` — a 100 TB scan
(thousands of row groups/splits) and every shuffle-produced
intermediate (already at ``spark.sql.shuffle.partitions``) skip it,
so the exchange it adds can never appear in a plan that is already
wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` up to the session's default parallelism when
    (and only when) it is narrower — see module docstring.

    The width probe (``df.rdd.getNumPartitions()``) compiles the
    physical plan once, even on the no-op path — bounded because every
    caller is a once-per-query builder, never a per-row or
    per-iteration loop (this function is the ONLY width probe in the
    repo; call it instead of inlining the pattern). If a future hot
    path needs the decision without plan compilation, derive it from
    the scan's file listing instead."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    return df
