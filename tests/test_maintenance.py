"""Compaction (sources/maintenance.py): fragmented partition
directories are rewritten to ~1 file each with identical rows and
intact pruning."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from diagnosisextraction_ml_spark.sources.maintenance import (
    compact_partitioned,
    partition_file_stats,
)


def _fragmented_events(spark, sf_dir, tmp_path) -> str:
    """Simulate a streaming sink's fragmentation: 6 'micro-batches'
    each writing one file into every day directory."""
    from diagnosisextraction_ml_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_fragmented")
    ev.repartition(6).write.mode("overwrite").partitionBy("event_day").parquet(
        path
    )
    return path


def test_compaction_reduces_files_preserves_rows_and_pruning(
    spark, sf_dir, tmp_path
):
    path = _fragmented_events(spark, sf_dir, tmp_path)
    before_stats = partition_file_stats(path, "event_day")
    assert max(n for n, _ in before_stats.values()) > 1  # fragmented
    want = spark.read.parquet(path)
    want_rows = sorted(map(tuple, want.collect()))
    want_days = want.select("event_day").distinct().count()

    res = compact_partitioned(spark, path, "event_day")
    assert res["files_after"] < res["files_before"]
    after_stats = partition_file_stats(path, "event_day")
    assert len(after_stats) == want_days  # directory layout intact
    assert all(n == 1 for n, _ in after_stats.values())  # ~1 file/day

    got = spark.read.parquet(path)
    assert sorted(map(tuple, got.collect())) == want_rows
    # pruning still works on the compacted tree
    week = got.filter(F.col("event_day").between("2024-01-08", "2024-01-14"))
    plan = week._jdf.queryExecution().executedPlan().toString()
    line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "event_day" in line.split("PartitionFilters:")[1].split("]")[0]
    assert week.select(F.input_file_name()).distinct().count() == 7
    # no staging or trash debris
    parent = os.path.dirname(path)
    assert not [
        d for d in os.listdir(parent) if ".compact." in d or ".trash." in d
    ]


def test_compaction_failure_restores_live_tree(spark, sf_dir, tmp_path, monkeypatch):
    """If the second rename fails, the first is rolled back: the live
    tree must still be the original data."""
    import diagnosisextraction_ml_spark.sources.maintenance as m

    path = _fragmented_events(spark, sf_dir, tmp_path)
    want = spark.read.parquet(path).count()

    real_rename = os.rename
    calls = {"n": 0}

    def flaky_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # the staging → live rename
            raise OSError("simulated failure")
        return real_rename(src, dst)

    monkeypatch.setattr(m.os, "rename", flaky_rename)
    try:
        compact_partitioned(spark, path, "event_day")
        raised = False
    except OSError:
        raised = True
    assert raised
    assert spark.read.parquet(path).count() == want  # restored
