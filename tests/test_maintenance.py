"""Compaction (sources/maintenance.py): fragmented partition
directories are rewritten to ~1 file each with identical rows and
intact pruning — published as an immutable version behind an
atomically-flipped pointer, verified by recount before the flip."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.sources.maintenance import (
    compact_partitioned,
    current_version_dir,
    partition_file_stats,
    recover_layout,
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
    # pruning still works on the compacted tree (read through the link)
    week = got.filter(F.col("event_day").between("2024-01-08", "2024-01-14"))
    plan = week._jdf.queryExecution().executedPlan().toString()
    line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "event_day" in line.split("PartitionFilters:")[1].split("]")[0]
    assert week.select(F.input_file_name()).distinct().count() == 7
    # pointer semantics: path is now a symlink into the versions root,
    # the pre-compaction tree is retained as the previous version, and
    # no staging/pointer debris is left behind
    assert os.path.islink(path)
    vroot = path + ".versions"
    versions = sorted(d for d in os.listdir(vroot) if d.startswith("v"))
    assert len(versions) == 2  # migrated original + compacted
    assert current_version_dir(path) == os.path.join(vroot, versions[-1])
    assert not [d for d in os.listdir(vroot) if d.startswith(".stage.")]
    parent = os.path.dirname(path)
    assert not [d for d in os.listdir(parent) if ".lnk." in d]


def test_second_compaction_is_pure_pointer_flip_and_prunes_versions(
    spark, sf_dir, tmp_path
):
    path = _fragmented_events(spark, sf_dir, tmp_path)
    want = spark.read.parquet(path).count()
    r1 = compact_partitioned(spark, path, "event_day")
    r2 = compact_partitioned(spark, path, "event_day", keep_versions=2)
    assert r2["version"] == r1["version"] + 1
    assert r2["rows"] == want
    vroot = path + ".versions"
    versions = sorted(d for d in os.listdir(vroot) if d.startswith("v"))
    assert len(versions) == 2  # oldest pruned, previous retained
    assert spark.read.parquet(path).count() == want


def test_compaction_pointer_flip_failure_leaves_live_tree(
    spark, sf_dir, tmp_path, monkeypatch
):
    """If the atomic pointer flip itself fails, the live tree (still
    the original plain directory) must be untouched and readable."""
    import diagnosisextraction_ml_spark.sources.maintenance as m

    path = _fragmented_events(spark, sf_dir, tmp_path)
    want = spark.read.parquet(path).count()

    real_symlink = os.symlink

    def broken_symlink(src, dst):
        raise OSError("simulated pointer-flip failure")

    monkeypatch.setattr(m.os, "symlink", broken_symlink)
    with pytest.raises(OSError):
        compact_partitioned(spark, path, "event_day")
    monkeypatch.setattr(m.os, "symlink", real_symlink)
    # migration had archived the plain dir; recovery restores a pointer
    recover_layout(path)
    assert spark.read.parquet(path).count() == want


def test_compaction_verification_mismatch_aborts_untouched(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r13 (medium): the staged tree is recounted against the
    snapshot BEFORE anything live is touched — a mismatch aborts with
    the original tree fully intact and no version/staging debris."""
    import diagnosisextraction_ml_spark.sources.maintenance as m

    path = _fragmented_events(spark, sf_dir, tmp_path)
    want = sorted(map(tuple, spark.read.parquet(path).collect()))

    real_count = m._count_rows
    calls = {"n": 0}

    def lying_count(spark_, p):
        calls["n"] += 1
        n = real_count(spark_, p)
        return n - 1 if calls["n"] == 2 else n  # corrupt the recount

    monkeypatch.setattr(m, "_count_rows", lying_count)
    with pytest.raises(RuntimeError, match="compaction aborted"):
        compact_partitioned(spark, path, "event_day")
    assert not os.path.islink(path)  # live tree never replaced
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want
    vroot = path + ".versions"
    assert not [d for d in os.listdir(vroot) if d.startswith(".stage.")]
    assert not [d for d in os.listdir(vroot) if d.startswith("v")]


def test_recover_layout_restores_pointer_after_migration_crash(
    spark, sf_dir, tmp_path
):
    """ADVICE r13 (low): a crash between the migration renames leaves
    no live path; recover_layout restores the newest version."""
    path = _fragmented_events(spark, sf_dir, tmp_path)
    want = spark.read.parquet(path).count()
    compact_partitioned(spark, path, "event_day")
    # simulate the crash state: pointer gone, versions intact
    os.remove(path)
    assert recover_layout(path)
    assert os.path.islink(path)
    assert spark.read.parquet(path).count() == want
    assert not recover_layout(path)  # no-op when path exists


def test_inflight_reader_survives_pointer_flip(spark, sf_dir, tmp_path):
    """A DataFrame planned against current_version_dir BEFORE a
    compaction still collects correctly AFTER the flip — the previous
    version is retained for exactly this reason."""
    path = _fragmented_events(spark, sf_dir, tmp_path)
    compact_partitioned(spark, path, "event_day")
    pinned = spark.read.parquet(current_version_dir(path))
    want = pinned.count()
    compact_partitioned(spark, path, "event_day")  # flips the pointer
    assert pinned.count() == want  # old version still on disk


@pytest.mark.slow
def test_two_process_reader_through_concurrent_compaction(
    spark, sf_dir, tmp_path
):
    """VERDICT r13 #4 done-criterion: a second OS process reads the
    tree in a loop while this process compacts it twice; every read
    succeeds with the full row count — no reader ever hits a missing
    path or a half-published tree."""
    import subprocess
    import sys

    path = _fragmented_events(spark, sf_dir, tmp_path)
    expect = spark.read.parquet(path).count()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "reader_loop.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {repo_root!r})\n"
        "from diagnosisextraction_ml_spark import get_spark\n"
        "from diagnosisextraction_ml_spark.sources.maintenance import read_compacted\n"
        "spark = get_spark('compact-reader', master='local[2]', shuffle_partitions=4)\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "for i in range(12):\n"
        f"    n = read_compacted(spark, {path!r}).count()\n"
        "    print('READ', i, n, flush=True)\n"
        f"    assert n == {expect}, (i, n)\n"
        "print('READER_OK')\n"
    )
    peer = subprocess.Popen(
        [sys.executable, str(script)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    compact_partitioned(spark, path, "event_day")
    compact_partitioned(spark, path, "event_day")
    out, _ = peer.communicate(timeout=600)
    assert peer.returncode == 0, out
    assert "READER_OK" in out
    assert spark.read.parquet(path).count() == expect


@pytest.mark.slow
def test_concurrent_compactor_loser_discards_and_reads_winner(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Two compactions racing on the same version slot: the loser's
    stage→version rename fails because the winner already published —
    it must discard its stage, adopt the winner's tree, and report
    lost_race_to_peer instead of crashing."""
    import diagnosisextraction_ml_spark.sources.maintenance as m

    path = _fragmented_events(spark, sf_dir, tmp_path)
    want = spark.read.parquet(path).count()

    # Build the real race: compact once (publishes a version), then
    # force a second compaction to collide on the SAME slot by feeding
    # it a stale version listing — exactly what a peer process sees
    # when the winner publishes between its listing and its rename.
    res1 = compact_partitioned(spark, path, "event_day")
    real_list = m._list_versions

    def stale_listing(vroot):
        versions = real_list(vroot)
        return versions[:-1]  # pretend the newest doesn't exist yet

    monkeypatch.setattr(m, "_list_versions", stale_listing)
    res2 = compact_partitioned(spark, path, "event_day")
    assert res2.get("lost_race_to_peer") is True
    assert res2["rows"] == want
    monkeypatch.undo()
    # live tree intact, no stage debris
    assert spark.read.parquet(path).count() == want
    vroot = path + ".versions"
    assert not [d for d in os.listdir(vroot) if d.startswith(".stage.")]
    assert res1["version"] >= 2


def test_stage_sweep_spares_live_peer_and_removes_dead(
    spark, sf_dir, tmp_path
):
    """ADVICE r14 (medium): the pre-compaction staging sweep must not
    rmtree a LIVE concurrent compactor's stage dir — only dirs whose
    owner pid is dead, stale beyond the threshold, or our own."""
    import subprocess
    import sys
    import time as _time

    import diagnosisextraction_ml_spark.sources.maintenance as m

    path = _fragmented_events(spark, sf_dir, tmp_path)
    vroot = path + ".versions"
    os.makedirs(vroot, exist_ok=True)

    # live peer: the pytest parent process is alive and is not us
    live = os.path.join(vroot, f".stage.{os.getppid()}")
    os.makedirs(live)
    (open(os.path.join(live, "inflight.parquet"), "w")).close()

    # dead peer: a subprocess that has already exited
    proc = subprocess.Popen([sys.executable, "-c", "pass"])
    proc.wait()
    dead = os.path.join(vroot, f".stage.{proc.pid}")
    os.makedirs(dead)

    # stale-but-unkillable peer (pid 1 exists but isn't ours): swept
    # via the mtime belt once past the staleness threshold
    stale = os.path.join(vroot, ".stage.1")
    os.makedirs(stale)
    old = _time.time() - m._STAGE_STALE_SEC - 60
    os.utime(stale, (old, old))

    res = compact_partitioned(spark, path, "event_day")
    assert res["files_after"] < res["files_before"]
    assert os.path.isdir(live), "live peer's staging dir was swept"
    assert not os.path.isdir(dead)
    assert not os.path.isdir(stale)


def test_writer_violation_between_snapshot_and_flip_aborts(
    spark, sf_dir, tmp_path, monkeypatch
):
    """VERDICT r14 #8 done-criterion: a concurrent append landing
    between the snapshot and the pointer flip ABORTS the compaction
    (live tree untouched, appended file preserved) instead of silently
    stranding the new rows in the soon-to-be-pruned version."""
    import shutil as _shutil

    import diagnosisextraction_ml_spark.sources.maintenance as m

    path = _fragmented_events(spark, sf_dir, tmp_path)

    real_count = m._count_rows
    state = {"n": 0, "violator": None}

    def appending_count(spark_, p):
        state["n"] += 1
        if state["n"] == 2:
            # the staged recount runs after the snapshot and before the
            # publish census — append a file to the LIVE tree here,
            # exactly the writer-contract violation window
            part = next(
                d for d in os.listdir(path) if d.startswith("event_day=")
            )
            src_file = next(
                f
                for f in os.listdir(os.path.join(path, part))
                if f.endswith(".parquet")
            )
            state["violator"] = os.path.join(
                path, part, "part-violator.parquet"
            )
            _shutil.copyfile(
                os.path.join(path, part, src_file), state["violator"]
            )
        return real_count(spark_, p)

    monkeypatch.setattr(m, "_count_rows", appending_count)
    with pytest.raises(RuntimeError, match="writer contract violated"):
        compact_partitioned(spark, path, "event_day")
    assert not os.path.islink(path)  # live tree never replaced
    assert os.path.exists(state["violator"])  # violator lost nothing
    vroot = path + ".versions"
    assert not [d for d in os.listdir(vroot) if d.startswith(".stage.")]
    assert not [d for d in os.listdir(vroot) if d.startswith("v")]
