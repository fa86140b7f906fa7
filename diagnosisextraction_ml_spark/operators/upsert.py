"""Keyed-snapshot upsert — the MERGE INTO / SCD-1 maintenance pattern.

North-star extension (no reference counterpart): production pipelines
maintain a "latest state per key" table (account state, feature
snapshot, crawl frontier) that each incoming batch upserts into. The
lakehouse engines spell this ``MERGE INTO``; the relational core is an
arg-max per key over ``snapshot ∪ batch``, and that is exactly what
this module computes — deterministically.

Scale design:

- **groupBy + max(struct), not a window.** The arg-max runs with
  map-side combine: each task first collapses its partition to one row
  per key, so the one Exchange carries ≤ |keys| rows per task. Spark
  plans the struct-max as a SortAggregate (struct buffers aren't
  hash-aggregable), but that sort is *per-partition and spillable* —
  unlike a ``row_number() OVER`` twin, which shuffles every key's full
  history before any reduction (fine for the oracle, wrong for
  100 TB).
- **The batch reduces before it meets the snapshot.** ``unionByName``
  feeds one aggregation, so a 10⁹-row batch against a 10¹²-row
  snapshot still shuffles each side exactly once on the key. With the
  snapshot stored bucketed on the key (sources/bucketed.py) the
  snapshot side's Exchange disappears entirely and only the batch
  moves.
- **Determinism.** The struct compares ``order_cols`` first (newest
  wins), then ``tiebreak_cols`` (a unique id), so at equal timestamps
  the survivor is the same on any partitioning or cluster size —
  the same idiom as the engine's dedup canonical-keep.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_latest(
    snapshot: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    tiebreak_cols: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """Merge ``batch`` into ``snapshot``, keeping the latest row per key.

    Latest = max over ``(order_cols, tiebreak_cols)`` lexicographically;
    ``payload_cols`` ride along. Columns shared by both inputs must have
    identical names/types (``unionByName``). The output schema is
    ``key_cols + order_cols + tiebreak_cols + payload_cols`` — feeding
    it back in as next round's ``snapshot`` is the incremental loop.
    """
    key_cols = list(key_cols)
    picked = [*order_cols, *tiebreak_cols, *payload_cols]
    cols = [*key_cols, *picked]
    combined = snapshot.select(*cols).unionByName(batch.select(*cols))
    agg = combined.groupBy(*key_cols).agg(
        F.max(F.struct(*[F.col(c) for c in picked])).alias("__latest")
    )
    return agg.select(
        *key_cols, *[F.col(f"__latest.{c}").alias(c) for c in picked]
    )
