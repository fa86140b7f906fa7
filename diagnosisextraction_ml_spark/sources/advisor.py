"""Layout advisor — the measured storage-layout decision rules as code.

PERF.md records WHEN each physical-layout lever pays, as same-session
measured pairs (sf1/sf10/sf100). This module turns that prose into a
pure function so the knowledge is consumed programmatically instead of
re-derived: given a table's size, its key cardinalities, and the query
kinds that hit it, recommend a layout and say which cost regime the
recommendation lives in.

The thresholds are MEASUREMENTS, not tunables (tests pin them to the
PERF.md numbers they come from):

- ``MIN_COMBINED_CELL_BYTES = 100 MB`` — the combined
  (partitioned+bucketed) layout loses 2.1× locally at sf10 because
  months × buckets cells land ~1 MB each and a bucketed scan can
  neither split nor coalesce files; the win region starts when every
  (partition, bucket) cell clears ~100 MB (a ~265 GB table at
  83×32 cells; 100 TB/7 years ⇒ ~37 GB/cell — comfortably right).
- ``PARTITION_DIR_BYTES = (100 MB, 10 GB)`` — directory-partitioning
  granularity (sources/partitioned.py): day-partitioning 100 TB/year
  gives ~275 GB/day (right-sized); minute-partitioning makes millions
  of tiny directories and the listing dominates.
- ``BROADCAST_MAX_BYTES = 10 MB`` — Spark's autoBroadcastJoinThreshold
  default: a dimension under it broadcasts; no layout lever applies.
- Bucketing pays when a repeated join/aggregate KEY matches the bucket
  key and both sides are too big to broadcast (Q3 3.6×, Q18 5.4×,
  Q21 sf100: 55.5 s @ 8 GB vs plain 339 s needing 48 GB). Amortize:
  one layout serves every query on that key (Q3/Q4/Q8/Q18/Q21 ride
  one lineitem copy; Q20 rides Q17's partkey copy free).
- Partition pruning pays in the IO-bound / cold-object-store regime;
  on a warm local page cache it is a WASH until the decode cost
  outgrows constant per-directory overhead (Q6: wash at sf1/sf10,
  crossover at sf100 — 2.44 s plain vs 1.58 s pruned). The advisor
  still recommends it for time/category-filtered scans at scale, with
  the regime labelled honestly.
- ``fan_out`` applies only when a narrow scan yields fewer input
  partitions than the session has cores (functions/partitioning.py;
  doc_stats 1.27→0.71 s, REJECTED for already-wide scans).
"""

from __future__ import annotations

from dataclasses import dataclass, field

MB = 1024 * 1024
GB = 1024 * MB

MIN_COMBINED_CELL_BYTES = 100 * MB
PARTITION_DIR_BYTES = (100 * MB, 10 * GB)
BROADCAST_MAX_BYTES = 10 * MB
# bucket files want the same ~128 MB-1 GB band as any parquet split
TARGET_BUCKET_BYTES = 512 * MB

# --- SemDeDup sizing (PERF.md round 14) ------------------------------------
# The registry constant k=32 was measured DEAD at the third decade
# (pipeline_text_semdedup killed at 1500 s on the 5M-doc corpus: the
# in-cluster pair scan is ~n²/k cosines). The measured fix is k ∝ n at
# ~2000 docs/cluster (sf10 k=250 → 29.3 s; sf100 k=2500 → 320.9 s) —
# which tracks the paper's c ≈ √n cluster-size rule within ~3× at the
# measured decades. Above ~1M rows the n·k assignment matrix becomes
# the next wall; the IVF-pruned assignment (probe=8) cut sf100 from
# 320.9 s to 175.6 s with ≥95% agreement / ≤0.10 cosine regret pinned.
SEMDEDUP_DOCS_PER_CLUSTER = 2000
SEMDEDUP_MIN_K = 32
SEMDEDUP_PRUNE_MIN_K = 64  # below this, m=⌈√k⌉ < 8 cells: nothing to prune
SEMDEDUP_PRUNE_MIN_ROWS = 1_000_000  # the decade where n·k is the wall
SEMDEDUP_DEFAULT_PROBE = 8

# --- Compaction cadence (PERF.md round 14) ----------------------------------
# Compacting the fragmented streaming-sink tree (1,920 → 30 files) made
# the full scan 4.7× faster; the rewrite cost ≈ 5 full scans of the
# compacted tree on warm local disk. On a cold object store the
# per-file overhead (HTTP round-trip per open) is the term that
# explodes, so payback needs strictly fewer scans — conservatively 2.
COMPACTION_PAYBACK_SCANS_LOCAL = 5
COMPACTION_PAYBACK_SCANS_OBJECT_STORE = 2
COMPACTION_MIN_FILES_PER_PARTITION = 2  # ≤1 file/dir: nothing to merge


@dataclass(frozen=True)
class LayoutAdvice:
    """One recommended physical decision for a table."""

    kind: str  # 'broadcast' | 'bucketed' | 'partitioned' | 'combined' | 'fan_out' | 'none'
    column: str | None  # bucket key or partition column (None for table-wide)
    n_buckets: int | None
    regime: str  # 'win' | 'wash_until_io_bound' | 'loss'
    reason: str


@dataclass(frozen=True)
class TableStats:
    total_bytes: int
    rows: int
    # distinct-value counts for candidate columns (join keys and
    # candidate partition columns alike)
    key_cardinalities: dict[str, int] = field(default_factory=dict)


def suggest_n_buckets(total_bytes: int) -> int:
    """Bucket count sizing each bucket file near TARGET_BUCKET_BYTES,
    clamped to a power of two in [8, 4096] (powers of two keep bucket
    unions/splits aligned when tables with different counts join)."""
    want = max(1, total_bytes // TARGET_BUCKET_BYTES)
    n = 8
    while n < want and n < 4096:
        n *= 2
    return n


@dataclass(frozen=True)
class SemDeDupAdvice:
    """Measured SemDeDup sizing for a corpus of ``n_rows`` embeddings."""

    k: int  # cluster count (k ∝ n, ~2000 docs/cluster)
    assign_probe: int | None  # IVF nprobe; None = exact assignment
    regime: str  # 'win' | 'exact_is_fine'
    reason: str


def advise_semdedup(n_rows: int, exact_replay: bool = False) -> SemDeDupAdvice:
    """SemDeDup sizing — the round-14 measurements as a decision rule.

    ``k = max(32, n // 2000)`` (k ∝ n): the fixed registry constant
    k=32 was measured DEAD at the third decade (pipeline_text_semdedup
    killed at 1500 s on 5M docs — the in-cluster pair scan is ~n²/k);
    k ∝ n restored sublinearity (sf10 29.3 s, sf100 320.9 s). This
    tracks the paper's c ≈ √n cluster-size rule within ~3× at the
    measured decades.

    ``assign_probe``: above ~1M rows the n·k assignment matrix is the
    next wall (~85% of cluster+dedup cost at sf100); the IVF-pruned
    assignment with probe=8 cut sf100 320.9 → 175.6 s with ≥95%
    agreement / ≤0.10 cosine regret test-pinned. Below that decade —
    or whenever k < ``SEMDEDUP_PRUNE_MIN_K`` (m = ⌈√k⌉ < 8 meta-cells:
    nothing to prune) — the exact path is already fine and approximate
    assignment buys nothing.

    ``exact_replay=True`` (oracle/registry twins, bit-exact
    replayability required): always exact assignment — the probed path
    is approximate by construction except at probe=m.
    """
    k = max(SEMDEDUP_MIN_K, n_rows // SEMDEDUP_DOCS_PER_CLUSTER)
    if exact_replay:
        return SemDeDupAdvice(
            k, None, "exact_is_fine",
            f"exact replay requested: k={k} (k ∝ n), exact assignment "
            "so the DuckDB twin replays bit-for-bit",
        )
    if n_rows >= SEMDEDUP_PRUNE_MIN_ROWS and k >= SEMDEDUP_PRUNE_MIN_K:
        return SemDeDupAdvice(
            k, SEMDEDUP_DEFAULT_PROBE, "win",
            f"n={n_rows}: the n·k assignment matrix is the measured "
            f"wall (85% of cluster+dedup at sf100); probe="
            f"{SEMDEDUP_DEFAULT_PROBE} cut 320.9→175.6 s with pinned "
            "≥95% agreement",
        )
    return SemDeDupAdvice(
        k, None, "exact_is_fine",
        f"n={n_rows} below the measured n·k wall (1M rows) or k={k} "
        f"too small to prune (m=⌈√k⌉ < 8 cells): exact assignment",
    )


@dataclass(frozen=True)
class StateStoreAdvice:
    """Which Structured Streaming state-store provider to run."""

    provider: str  # 'hdfs' (in-memory) | 'rocksdb'
    regime: str  # 'win' | 'required'
    reason: str


#: Fraction of executor heap that open-session state may occupy before
#: the in-memory HDFSBackedStateStore becomes an OOM bet. Streaming
#: decade measurement (PERF.md r15, re-run r16): sessionization state
#: is LINEAR in open keys — 3.2 MB / 320 sessions (sf0.1), 32 MB /
#: 3,200 (sf1, independently reproduced r16), 333 MB / 32,000 (sf10),
#: ~10 KB per open session at every rung — while RocksDB costs
#: measured per-batch wall at scales where state still fits (1.33×
#: at sf1 r16, 1.6-2.6× at sf10 r15; the cost grows with state) —
#: so the switch should happen at the projection, not before.
STATE_HEAP_FRACTION = 0.5


def advise_state_store(
    projected_state_bytes: int, executor_heap_bytes: int
) -> StateStoreAdvice:
    """The round-15 streaming measurement as a decision rule.

    Stay on the in-memory provider while projected state fits well
    inside the heap — RocksDB's changelog/snapshot work costs
    1.6-2.6× per-batch wall (measured sf10, tools/streaming_scale.py)
    and buys nothing until memory is the binding constraint. Past
    ``STATE_HEAP_FRACTION`` of the executor heap, RocksDB is not an
    optimization but a requirement: its footprint is bounded by
    configuration (block cache + memtables) where the in-memory
    store grows linearly with open sessions (~33 GB projected at the
    3.2M-user decade — past any single heap).
    """
    line = int(executor_heap_bytes * STATE_HEAP_FRACTION)
    if projected_state_bytes <= line:
        return StateStoreAdvice(
            "hdfs", "win",
            f"projected state {projected_state_bytes / MB:.0f} MB ≤ "
            f"{line / MB:.0f} MB ({STATE_HEAP_FRACTION:.0%} of heap): "
            "in-memory store; RocksDB would cost a measured 1.6-2.6× "
            "per-batch wall for nothing",
        )
    return StateStoreAdvice(
        "rocksdb", "required",
        f"projected state {projected_state_bytes / MB:.0f} MB > "
        f"{line / MB:.0f} MB: the in-memory store grows linearly with "
        "open sessions and will OOM; RocksDB's config-bounded "
        "footprint is the only rung that keeps running (take the "
        "measured wall cost as the price)",
    )


@dataclass(frozen=True)
class CompactionAdvice:
    """Whether compacting a fragmented partitioned tree pays now."""

    compact: bool
    regime: str  # 'win' | 'skip'
    reason: str


def advise_compaction(
    n_files: int,
    n_partitions: int,
    expected_full_scans: int,
    object_store: bool = False,
) -> CompactionAdvice:
    """Compaction cadence — the round-14 measurement as a decision rule.

    Compacting the fragmented streaming-sink tree (1,920 files over 30
    day-directories → 30) made the full scan 4.7× faster; the rewrite
    cost ≈ ``COMPACTION_PAYBACK_SCANS_LOCAL`` (5) full scans of the
    compacted tree on warm local disk. Per-file open overhead is the
    term that explodes on a cold object store (an HTTP round-trip per
    footer), so payback there needs strictly fewer scans
    (``COMPACTION_PAYBACK_SCANS_OBJECT_STORE`` = 2, conservative).
    Compact when the tree is actually fragmented (≥2 files/partition
    on average) AND you expect at least the payback number of full
    scans before the next fragmentation cycle.
    """
    payback = (
        COMPACTION_PAYBACK_SCANS_OBJECT_STORE
        if object_store
        else COMPACTION_PAYBACK_SCANS_LOCAL
    )
    files_per_part = n_files / max(1, n_partitions)
    if files_per_part < COMPACTION_MIN_FILES_PER_PARTITION:
        return CompactionAdvice(
            False, "skip",
            f"~{files_per_part:.1f} files/partition: already compact, "
            "a rewrite buys nothing",
        )
    if expected_full_scans >= payback:
        return CompactionAdvice(
            True, "win",
            f"{n_files} files over {n_partitions} partitions and "
            f"≥{payback} expected scans: rewrite cost ≈ {payback} "
            "scans (measured 4.7× scan speedup at 1,920→30 files; "
            f"object_store={object_store})",
        )
    return CompactionAdvice(
        False, "skip",
        f"only {expected_full_scans} expected scans < payback "
        f"{payback}: the rewrite costs more than it saves this cycle",
    )


def advise_layout(
    table: TableStats,
    query_kinds: list[tuple[str, str]],
    session_parallelism: int | None = None,
    scan_partitions: int | None = None,
    cpu_heavy_projection: bool = True,
) -> list[LayoutAdvice]:
    """The measured decision procedure. ``query_kinds`` is the workload
    summary for this table: (kind, column) pairs where kind is one of
    ``join`` / ``agg`` (shuffle-keyed operations on column) or
    ``time_range`` / ``category_eq`` (prunable scan predicates on
    column). Returns recommendations ordered most- to
    least-impactful; 'none'/'loss' rows are included so a rejected
    lever is an explicit, explained decision (PERF.md doctrine:
    record the losses, don't tune them away)."""
    out: list[LayoutAdvice] = []

    # 1. Small table: broadcast ends the discussion — no layout lever
    #    beats shipping the table to every executor once.
    if table.total_bytes <= BROADCAST_MAX_BYTES:
        return [
            LayoutAdvice(
                "broadcast", None, None, "win",
                f"table is {table.total_bytes / MB:.1f} MB ≤ "
                f"{BROADCAST_MAX_BYTES // MB} MB: broadcast every join; "
                "bucketing/partitioning add build cost for nothing",
            )
        ]

    shuffle_keys = [c for k, c in query_kinds if k in ("join", "agg")]
    prune_cols = [c for k, c in query_kinds if k in ("time_range", "category_eq")]

    # 2. Bucketing: one copy per hot shuffle key, sized to the table.
    for col in dict.fromkeys(shuffle_keys):  # preserve order, dedup
        n = suggest_n_buckets(table.total_bytes)
        out.append(
            LayoutAdvice(
                "bucketed", col, n, "win",
                f"repeated join/agg on {col}: bucket-local plan deletes "
                f"the fact shuffle (measured 3.6-5.4× at sf10; sf100 Q21 "
                f"ran in 8 GB heap where the plain plan needed 48 GB); "
                f"{n} buckets target ~{TARGET_BUCKET_BYTES // MB} MB files",
            )
        )

    # 3. Directory partitioning: granularity must land in the measured
    #    band, and the win is honestly an IO-bound-regime win.
    for col in dict.fromkeys(prune_cols):
        card = table.key_cardinalities.get(col)
        if not card:
            continue
        dir_bytes = table.total_bytes // card
        lo, hi = PARTITION_DIR_BYTES
        if dir_bytes < lo:
            out.append(
                LayoutAdvice(
                    "partitioned", col, None, "loss",
                    f"{card} directories of ~{dir_bytes / MB:.1f} MB each "
                    f"< {lo // MB} MB: listing/footer overhead dominates "
                    "(the too-fine-partitioning failure mode); use a "
                    "coarser derived column",
                )
            )
        elif dir_bytes > hi:
            out.append(
                LayoutAdvice(
                    "partitioned", col, None, "wash_until_io_bound",
                    f"directories of ~{dir_bytes / GB:.1f} GB exceed "
                    f"{hi // GB} GB: pruning still correct but each "
                    "surviving directory is a huge scan; prefer a finer "
                    "derived column",
                )
            )
        else:
            out.append(
                LayoutAdvice(
                    "partitioned", col, None, "wins_when_io_bound",
                    f"{card} right-sized directories "
                    f"(~{dir_bytes / MB:.0f} MB): prunable predicates "
                    "skip listing+fetch; measured wash on warm local "
                    "cache until the sf100 decade (Q6 2.44→1.58 s), the "
                    "real payoff is the cold-store regime",
                )
            )

    # 4. Combined layout: only when EVERY (partition, bucket) cell
    #    clears the measured 100 MB line.
    if shuffle_keys and prune_cols:
        key, pcol = shuffle_keys[0], prune_cols[0]
        card = table.key_cardinalities.get(pcol)
        if card:
            n = suggest_n_buckets(table.total_bytes)
            cell = table.total_bytes // (card * n)
            if cell >= MIN_COMBINED_CELL_BYTES:
                out.append(
                    LayoutAdvice(
                        "combined", f"{pcol}+{key}", n, "win",
                        f"~{cell / GB:.1f} GB per (partition, bucket) "
                        f"cell ≥ {MIN_COMBINED_CELL_BYTES // MB} MB: both "
                        "levers in one table (prune at listing, join "
                        "bucket-local)",
                    )
                )
            else:
                out.append(
                    LayoutAdvice(
                        "combined", f"{pcol}+{key}", n, "loss",
                        f"~{cell / MB:.2f} MB per cell < "
                        f"{MIN_COMBINED_CELL_BYTES // MB} MB: measured "
                        "2.1× SLOWER at sf10 (bucketed scans can't "
                        "coalesce tiny files); keep the single-axis "
                        "layouts until the table feeds both",
                    )
                )

    # 5. fan_out: a session-level fix, only for under-parallel scans
    #    FEEDING CPU-HEAVY projections. The r15 A/B sharpened the rule:
    #    on 3-split inputs feeding cheap partial aggregates the added
    #    exchange LOSES (pagerank adjacency 0.78→1.32 s, assoc baskets
    #    0.82→1.24 s) — tokenize/shingle/hash work is what the extra
    #    cores must have to pay for the shuffle.
    if session_parallelism and scan_partitions:
        if scan_partitions < session_parallelism and not cpu_heavy_projection:
            out.append(
                LayoutAdvice(
                    "fan_out", None, None, "loss",
                    f"scan is narrow ({scan_partitions} < "
                    f"{session_parallelism}) but the projection is "
                    "cheap (plain partial aggregate): measured losses "
                    "0.78→1.32 s / 0.82→1.24 s (r15) — the exchange "
                    "costs more than the parallelism buys",
                )
            )
        elif scan_partitions < session_parallelism:
            out.append(
                LayoutAdvice(
                    "fan_out", None, None, "win",
                    f"scan yields {scan_partitions} partitions < "
                    f"{session_parallelism} cores feeding CPU-heavy "
                    "projection: round-robin fan-out packs the CPU "
                    "(doc_stats 1.27→0.71 s); no-ops on wide scans",
                )
            )
        else:
            out.append(
                LayoutAdvice(
                    "fan_out", None, None, "loss",
                    f"scan already yields {scan_partitions} ≥ "
                    f"{session_parallelism} partitions: fan-out adds an "
                    "exchange for nothing (measured-and-rejected for "
                    "top_k_words)",
                )
            )

    if not out:
        out.append(
            LayoutAdvice(
                "none", None, None, "win",
                "no repeated shuffle key and no prunable predicate: a "
                "plain parquet scan with pushdown is already the plan "
                "you'd want",
            )
        )
    return out
