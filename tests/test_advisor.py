"""Layout advisor (sources/advisor.py): the PERF.md measurements as a
pure decision function — tests pin the thresholds to the measured
values so the advice can't drift from the evidence behind it."""

from __future__ import annotations

from diagnosisextraction_ml_spark.sources.advisor import (
    GB,
    MB,
    MIN_COMBINED_CELL_BYTES,
    LayoutAdvice,
    TableStats,
    advise_layout,
    suggest_n_buckets,
)


def _by_kind(advice: list[LayoutAdvice], kind: str) -> LayoutAdvice:
    hits = [a for a in advice if a.kind == kind]
    assert hits, f"no {kind} advice in {advice}"
    return hits[0]


def test_small_dim_broadcasts_nothing_else():
    adv = advise_layout(
        TableStats(total_bytes=2 * MB, rows=25, key_cardinalities={}),
        query_kinds=[("join", "n_nationkey")],
    )
    assert len(adv) == 1 and adv[0].kind == "broadcast" and adv[0].regime == "win"


def test_hot_join_key_gets_bucketed_layout():
    # sf10 lineitem ≈ 2.5 GB, hot on l_orderkey (Q3/Q18/Q21 shape)
    adv = advise_layout(
        TableStats(2_500 * MB, 60_000_000, {"l_orderkey": 15_000_000}),
        query_kinds=[("join", "l_orderkey"), ("agg", "l_orderkey")],
    )
    b = _by_kind(adv, "bucketed")
    assert b.column == "l_orderkey" and b.regime == "win"
    assert b.n_buckets == suggest_n_buckets(2_500 * MB)


def test_combined_layout_rejected_below_measured_cell_line():
    """PERF.md: sf10's ~1 MB cells lose 2.1×; the advisor must say so."""
    table = TableStats(2_500 * MB, 60_000_000,
                       {"l_orderkey": 15_000_000, "l_shipmonth": 83})
    adv = advise_layout(
        table,
        query_kinds=[("join", "l_orderkey"), ("time_range", "l_shipmonth")],
    )
    c = _by_kind(adv, "combined")
    assert c.regime == "loss"
    assert "2.1×" in c.reason


def test_combined_layout_recommended_at_warehouse_scale():
    """100 TB / 7 years: ~37 GB per (month, bucket) cell at the
    suggested bucket count clears the 100 MB line easily."""
    table = TableStats(100 * 1024 * GB, 600_000_000_000,
                       {"l_orderkey": 150_000_000_000, "l_shipmonth": 84})
    adv = advise_layout(
        table,
        query_kinds=[("join", "l_orderkey"), ("time_range", "l_shipmonth")],
    )
    c = _by_kind(adv, "combined")
    assert c.regime == "win"
    n = suggest_n_buckets(table.total_bytes)
    assert table.total_bytes // (84 * n) >= MIN_COMBINED_CELL_BYTES


def test_partition_granularity_band():
    # minute-partitioning a 1 TB table: ~526k dirs of ~2 MB — too fine
    fine = advise_layout(
        TableStats(1024 * GB, 10**10, {"event_minute": 525_600}),
        query_kinds=[("time_range", "event_minute")],
    )
    assert _by_kind(fine, "partitioned").regime == "loss"
    # day-partitioning 100 TB/year: ~275 GB/day — beyond the 10 GB
    # upper band edge, flagged as too coarse for fine-grained queries
    coarse = advise_layout(
        TableStats(100 * 1024 * GB, 10**12, {"event_day": 365}),
        query_kinds=[("time_range", "event_day")],
    )
    assert _by_kind(coarse, "partitioned").regime == "wash_until_io_bound"
    # right-sized: 1 TB over 2000 days ≈ 512 MB/dir
    good = advise_layout(
        TableStats(1024 * GB, 10**10, {"event_day": 2000}),
        query_kinds=[("time_range", "event_day")],
    )
    g = _by_kind(good, "partitioned")
    assert g.regime == "wins_when_io_bound"
    assert "cold-store" in g.reason  # the honest regime label


def test_fan_out_only_below_session_parallelism():
    table = TableStats(200 * MB, 60_000, {})
    under = advise_layout(table, [], session_parallelism=32, scan_partitions=2)
    assert _by_kind(under, "fan_out").regime == "win"
    wide = advise_layout(table, [], session_parallelism=32, scan_partitions=64)
    assert _by_kind(wide, "fan_out").regime == "loss"


def test_no_lever_applies_plain_scan():
    adv = advise_layout(TableStats(500 * MB, 10**6, {}), query_kinds=[])
    assert adv[0].kind == "none"


def test_suggest_n_buckets_power_of_two_band():
    assert suggest_n_buckets(1 * MB) == 8  # floor
    n = suggest_n_buckets(2_500 * MB)
    assert n & (n - 1) == 0 and 8 <= n <= 4096
    assert suggest_n_buckets(10**18) == 4096  # cap
    # each bucket lands near the 512 MB target at warehouse scale
    big = 100 * 1024 * GB
    nb = suggest_n_buckets(big)
    assert nb == 4096  # capped: 100 TB / 4096 = ~25 GB buckets — the
    # cap keeps bucket COUNT sane; combined layouts split further by
    # partition directories


# --- round 15: semdedup sizing + compaction cadence (VERDICT r14 #5) -------


def test_semdedup_k_proportional_to_n():
    from diagnosisextraction_ml_spark.sources.advisor import advise_semdedup

    # the sf100 corpus that killed k=32: 5M docs -> k=2500 (measured
    # 320.9s vs KILLED at 1500s)
    assert advise_semdedup(5_000_000).k == 2500
    # sf10: 500k docs -> k=250 (measured 29.3s)
    assert advise_semdedup(500_000).k == 250
    # the floor: small corpora keep the registry constant
    assert advise_semdedup(10_000).k == 32


def test_semdedup_probe_thresholds():
    from diagnosisextraction_ml_spark.sources.advisor import (
        SEMDEDUP_DEFAULT_PROBE,
        SEMDEDUP_PRUNE_MIN_ROWS,
        advise_semdedup,
    )

    # at the measured n·k wall: pruned assignment with probe=8
    a = advise_semdedup(5_000_000)
    assert a.assign_probe == SEMDEDUP_DEFAULT_PROBE and a.regime == "win"
    # one row under the wall: exact
    b = advise_semdedup(SEMDEDUP_PRUNE_MIN_ROWS - 1)
    assert b.assign_probe is None and b.regime == "exact_is_fine"
    # oracle replay always exact, any size
    c = advise_semdedup(5_000_000, exact_replay=True)
    assert c.assign_probe is None and c.k == 2500


def test_compaction_payback_thresholds():
    from diagnosisextraction_ml_spark.sources.advisor import advise_compaction

    # the measured case: 1,920 files / 30 partitions, payback = 5 scans
    assert advise_compaction(1920, 30, expected_full_scans=5).compact
    assert not advise_compaction(1920, 30, expected_full_scans=4).compact
    # object store: payback strictly fewer (2)
    assert advise_compaction(1920, 30, 2, object_store=True).compact
    assert not advise_compaction(1920, 30, 1, object_store=True).compact
    # an already-compact tree never rewrites, whatever the scan count
    assert not advise_compaction(30, 30, 100).compact


def test_state_store_crossover():
    from diagnosisextraction_ml_spark.sources.advisor import advise_state_store

    GB = 1024**3
    # the measured sf10 case: 333 MB state in an 8 GB heap — in-memory
    a = advise_state_store(333 * 1024**2, 8 * GB)
    assert a.provider == "hdfs" and a.regime == "win"
    # exactly the half-heap line stays in-memory; one byte past flips
    assert advise_state_store(4 * GB, 8 * GB).provider == "hdfs"
    b = advise_state_store(4 * GB + 1, 8 * GB)
    assert b.provider == "rocksdb" and b.regime == "required"


def test_fan_out_requires_cpu_heavy_projection():
    """r15 lesson encoded: a narrow scan feeding a cheap partial
    aggregate must NOT fan out (measured losses), only CPU-heavy
    projections justify the exchange."""
    from diagnosisextraction_ml_spark.sources.advisor import (
        TableStats,
        advise_layout,
    )

    t = TableStats(total_bytes=50 * 1024 * 1024, rows=1_000_000)
    cheap = [a for a in advise_layout(
        t, [], session_parallelism=32, scan_partitions=3,
        cpu_heavy_projection=False,
    ) if a.kind == "fan_out"]
    assert cheap and cheap[0].regime == "loss"
    heavy = [a for a in advise_layout(
        t, [], session_parallelism=32, scan_partitions=3,
    ) if a.kind == "fan_out"]
    assert heavy and heavy[0].regime == "win"
