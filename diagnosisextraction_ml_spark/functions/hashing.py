"""Shared deterministic hashing, identical in Spark and ANSI SQL.

Two primitives every "random-looking but reproducible" operator in this
engine builds on (fold assignment, downsampling, MinHash, SimHash,
fingerprints):

- ``md5_hash64``: 60-bit integer from the md5 of a string. md5 is
  bit-identical everywhere, so Spark and the DuckDB oracle can compute
  the *same* token hash — unlike ``F.hash`` (Murmur3, Spark-private) or
  DuckDB's ``hash()``.
- ``knuth_bucket``: multiplicative-hash bucket of an integer key
  (Knuth's 2654435761 on the low 32 bits). Pure integer arithmetic →
  expressible in any SQL dialect, stable at any scale, and uniform
  enough for sampling/splits.

Why not rand(seed)? Spark's rand is partition-dependent: the same row
gets a different value if the partitioning changes, so folds would not
be reproducible across cluster sizes. Hash-of-key sampling is the
scale-correct idiom (deterministic, shuffle-free, re-runnable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / golden ratio
M31 = 2147483647  # 2^31 - 1 (Mersenne prime)
# max intermediate: (M31-1) * KNUTH ≈ 5.7e18 < 2^63-1 — no int64
# overflow in either engine (DuckDB would raise / promote to HUGEINT on
# overflow while Spark silently wraps, so staying in-range is load-bearing
# for oracle equality).


def md5_hash64(col: Column | str) -> Column:
    """60-bit non-negative integer hash of a string (md5-based)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_hash64_sql(expr: str) -> str:
    """DuckDB-SQL twin of :func:`md5_hash64`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def knuth_bucket(col: Column | str, n_buckets: int) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer key."""
    c = F.col(col) if isinstance(col, str) else col
    return (((c.cast("long") % M31) * F.lit(KNUTH)) % F.lit(M31)) % F.lit(n_buckets)


def knuth_bucket_sql(expr: str, n_buckets: int) -> str:
    """DuckDB-SQL twin of :func:`knuth_bucket`."""
    return f"(((CAST({expr} AS BIGINT) % {M31}) * {KNUTH}) % {M31}) % {n_buckets}"
