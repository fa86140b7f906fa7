"""CPU-packing for narrow scans.

Per-row text work (tokenize / regex / shingle / hash) runs at the
INPUT's parallelism — Spark only re-distributes at the first shuffle.
A small single-file parquet scan (one row group → one split, however
low ``openCostInBytes`` goes) therefore pins all pre-shuffle CPU to
1-2 cores of a 32-core session. ``fan_out`` round-robins such inputs
up to the session's parallelism before the heavy projection.

Scale posture: this is explicitly a SMALL-INPUT fix. It no-ops for
any input wide enough to occupy every core at standard split sizing —
a 100 TB scan (thousands of row groups/splits) and every large
shuffle-produced intermediate skip it, so the exchange it adds can
never appear in a plan that is already wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024

#: Catalyst reports this (spark.sql.defaultSizeInBytes, Long.MaxValue
#: by default) when it cannot estimate a plan's size — treat as "not
#: small", i.e. no-op, the safe direction at scale.
_UNKNOWN_SIZE_FLOOR = 1 << 60


def _max_partition_bytes(spark) -> int:
    try:
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes")
        digits = "".join(c for c in str(raw) if c.isdigit())
        return int(digits) if digits else _DEFAULT_MAX_PARTITION_BYTES
    except Exception:  # noqa: BLE001 — conf lookup must not sink a plan
        return _DEFAULT_MAX_PARTITION_BYTES


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` up to the session's default parallelism when
    (and only when) it is narrower — see module docstring.

    Width probe (round 15): ``est_width = ⌈sizeInBytes /
    maxPartitionBytes⌉`` from the optimized plan's Catalyst statistics
    — METADATA ONLY, no job runs. The previous probe
    (``df.rdd.getNumPartitions()``) looked free but under AQE
    EXECUTES every upstream shuffle stage to finalize the plan
    (measured: 2 jobs / ~2 s on a groupBy input — the whole upstream
    ran twice per query). The size-derived estimate converges to the
    same decision because Spark itself sizes scan splits (and AQE
    coalesces reduce partitions) by bytes: a 45 MB single file → 1
    split (est 1); 40×1 MB files merge to ~1 split (est 1); a 10 GB
    file → ~80 splits (est 80). When Catalyst cannot estimate
    (``defaultSizeInBytes`` sentinel) the probe says "not small" —
    the safe no-op at scale. The RDD probe remains only as the
    exception fallback.
    """
    spark = df.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — fall back to the legacy probe
        size = None
    if size is None:
        if df.rdd.getNumPartitions() < parallelism:
            df = df.repartition(parallelism)
        return df
    if size >= _UNKNOWN_SIZE_FLOOR:
        return df  # unestimable — assume wide, never widen 100 TB
    est_width = max(1, -(-size // _max_partition_bytes(spark)))
    if est_width < parallelism:
        df = df.repartition(parallelism)
    return df
