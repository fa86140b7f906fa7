"""Layout maintenance — file compaction for partitioned parquet trees.

The measured failure mode of directory-partitioned storage (PERF.md's
combined-layout entry) is fragmentation: many small files per
partition directory make per-file open/footer overhead dominate the
scan. Streaming sinks fragment by construction — every micro-batch
writes at least one file per touched partition — so a 100 TB event
table needs periodic compaction: rewrite each partition's files into
~target-sized ones, preserving the directory layout (and therefore
partition pruning) exactly.

Compaction here is one Spark job, not a driver-side file loop:

- ``repartition(part_col)`` clusters each partition value into one
  task (AQE coalesces small ones), so each directory is rewritten as
  ~1 file, capped by ``maxRecordsPerFile`` for oversized partitions.

Publication is ATOMIC and VERIFIED (same doctrine as the bucketed /
partitioned layout builds in plans/queries.py):

- Each compaction lands in a new immutable VERSION directory under
  ``<path>.versions/`` and the user-facing ``path`` is a SYMLINK
  retargeted with ``symlink + os.rename`` — a single atomic POSIX
  rename over the old link. A reader never observes a missing or
  half-written ``path``. (The only non-atomic step is the one-time
  migration of a plain directory into version v000001, the first time
  a tree is ever compacted; every subsequent compaction is a pure
  pointer flip.)
- Before the flip, the staged tree is RE-COUNTED and compared against
  the pre-compaction snapshot count; any mismatch aborts — the staged
  tree is discarded and the live tree is untouched.
- The PREVIOUS version is retained (``keep_versions``, default 2), so
  an in-flight DataFrame that planned file paths against the old
  version keeps reading them after the flip. Readers that resolve
  ``current_version_dir(path)`` (realpath) at plan time are fully
  isolated for the version's whole retention window.
- A crash at any point leaves a live tree: either the old pointer
  still stands, or (migration only) :func:`recover_layout` restores
  the pointer from the newest complete version on the next call.

WRITER CONTRACT: writers must be quiesced during compaction. The
rewrite is a point-in-time snapshot of the current version. The
contract is ENFORCED, not just documented: the source tree's file
census (relative path + size) is recorded at snapshot time and
re-listed immediately before the pointer flip; any new or resized
file aborts the compaction (staged tree discarded, live tree
untouched), so a violating writer loses nothing and the violation is
an error, never a silent row loss into the pruned-version window.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_VERSIONS_SUFFIX = ".versions"

#: A concurrent compactor's staging dir is only swept when its owner
#: pid is gone OR it has sat untouched this long (belt for recycled
#: pids / remote-pid stores where os.kill can't see the owner).
_STAGE_STALE_SEC = 6 * 3600


def _versions_root(path: str) -> str:
    return path.rstrip("/") + _VERSIONS_SUFFIX


def _list_versions(vroot: str) -> list[str]:
    """Version directory names under vroot, oldest first."""
    if not os.path.isdir(vroot):
        return []
    return sorted(
        d for d in os.listdir(vroot)
        if d.startswith("v") and d[1:].isdigit()
        and os.path.isdir(os.path.join(vroot, d))
    )


def current_version_dir(path: str) -> str:
    """The physical directory behind ``path`` (realpath). Readers that
    plan against this are pinned to one immutable version for the
    whole query, isolated from concurrent pointer flips."""
    return os.path.realpath(path)


def read_compacted(spark: SparkSession, path: str):
    """Read a (possibly compaction-managed) partitioned tree, pinned
    to the current version at plan time."""
    return spark.read.parquet(current_version_dir(path))


def recover_layout(path: str) -> bool:
    """Crash recovery: if ``path`` is missing but versions exist
    (a crash during the one-time dir→symlink migration), restore the
    pointer to the newest complete version. Returns True if a restore
    happened. Safe to call any time; no-op when ``path`` exists."""
    if os.path.lexists(path):
        return False
    versions = _list_versions(_versions_root(path))
    if not versions:
        return False
    target = os.path.join(_versions_root(path), versions[-1])
    tmp = f"{path}.lnk.{os.getpid()}"
    if os.path.lexists(tmp):
        os.remove(tmp)
    os.symlink(target, tmp)
    os.rename(tmp, path)
    return True


def partition_file_stats(path: str, part_col: str) -> dict[str, tuple[int, int]]:
    """Per partition-value (n_files, total_bytes) from the directory
    tree (symlinks resolved). Local-filesystem listing; on a cluster
    store, do the same walk through the Hadoop FileSystem API."""
    out: dict[str, tuple[int, int]] = {}
    prefix = f"{part_col}="
    for d in os.listdir(path):
        if not d.startswith(prefix):
            continue
        full = os.path.join(path, d)
        files = [f for f in os.listdir(full) if f.endswith(".parquet")]
        out[d[len(prefix):]] = (
            len(files),
            sum(os.path.getsize(os.path.join(full, f)) for f in files),
        )
    return out


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _sweep_stale_stages(vroot: str) -> None:
    """Remove staging debris from CRASHED or FINISHED compactors only.

    A live concurrent compactor's ``.stage.<pid>`` directory must be
    left alone — this module advertises concurrent-compactor tolerance
    (lost_race_to_peer), and rmtree'ing a peer's in-flight staging tree
    would fail its Spark write or recount with a raw error instead of
    a graceful lost race. A dir is debris when its embedded pid is no
    longer alive, or (recycled-pid belt) it has not been modified for
    ``_STAGE_STALE_SEC``. Our own pid's leftovers are always swept.
    """
    now = time.time()
    for d in os.listdir(vroot):
        if not d.startswith(".stage."):
            continue
        full = os.path.join(vroot, d)
        pid_s = d[len(".stage."):]
        if pid_s.isdigit():
            pid = int(pid_s)
            if pid == os.getpid():
                shutil.rmtree(full, ignore_errors=True)
                continue
            if _pid_alive(pid):
                try:
                    fresh = now - os.path.getmtime(full) < _STAGE_STALE_SEC
                except OSError:
                    fresh = True
                if fresh:
                    continue  # live peer mid-compaction — hands off
        shutil.rmtree(full, ignore_errors=True)


def _file_census(path: str) -> dict[str, int]:
    """{relative data-file path: size} under ``path`` (symlink target
    walked). The writer-guard's snapshot unit: any file that appears
    or changes size between snapshot and publish means a writer broke
    the quiesce contract."""
    out: dict[str, int] = {}
    root = os.path.realpath(path)
    for dirpath, _dirnames, filenames in os.walk(root):
        for f in filenames:
            if f.startswith(("_", ".")):
                continue  # _SUCCESS, hidden markers — not data
            full = os.path.join(dirpath, f)
            out[os.path.relpath(full, root)] = os.path.getsize(full)
    return out


def _count_rows(spark: SparkSession, path: str) -> int:
    """Row count of a parquet tree (isolated so the verification step
    is independently testable/monkeypatchable)."""
    return spark.read.parquet(path).count()


def compact_partitioned(
    spark: SparkSession,
    path: str,
    part_col: str,
    max_records_per_file: int = 5_000_000,
    keep_versions: int = 2,
) -> dict[str, int]:
    """Rewrite the partitioned parquet tree at ``path`` with ~1 file
    per partition value (``max_records_per_file`` caps oversized
    ones), published as a new version behind an atomically-flipped
    pointer (module docstring). Returns {"files_before": n,
    "files_after": m, "rows": total, "version": k}. Layout, schema,
    and row set are unchanged — verified by a staged-tree recount
    before the old tree is ever touched. Writers must be quiesced
    (module docstring, WRITER CONTRACT)."""
    recover_layout(path)
    src = current_version_dir(path)
    before = partition_file_stats(src, part_col)
    files_before = sum(n for n, _ in before.values())
    # WRITER-GUARD census: snapshot the source tree's file set now;
    # re-listed just before publish. A writer violating the quiesce
    # contract is then an ABORT, not a silent row loss into the
    # retained-version window.
    census0 = _file_census(src)
    rows = _count_rows(spark, src)

    vroot = _versions_root(path)
    os.makedirs(vroot, exist_ok=True)
    # sweep staging debris from crashed/finished peers only — a LIVE
    # peer's stage dir is protected (pid liveness + mtime staleness)
    _sweep_stale_stages(vroot)

    existing = _list_versions(vroot)
    nxt = (int(existing[-1][1:]) if existing else 0) + 1
    migrating = not os.path.islink(path)
    if migrating:
        nxt += 1  # reserve the first slot for the migrated live tree

    stage = os.path.join(vroot, f".stage.{os.getpid()}")
    shutil.rmtree(stage, ignore_errors=True)
    (
        spark.read.parquet(src)
        .repartition(F.col(part_col))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(part_col)
        .parquet(stage)
    )
    # VERIFY before publishing: the compacted tree must carry exactly
    # the snapshot's rows — abort (live tree untouched) on mismatch.
    staged_rows = _count_rows(spark, stage)
    if staged_rows != rows:
        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(
            f"compaction aborted: staged tree has {staged_rows} rows, "
            f"snapshot had {rows}; live tree at {path} is untouched"
        )
    # WRITER-GUARD check: re-list the source tree just before the flip.
    # Any file added or resized since the snapshot means a writer broke
    # the quiesce contract — abort so its rows can't silently land only
    # in the soon-to-be-pruned previous version.
    census1 = _file_census(src)
    if census1 != census0:
        changed = sorted(
            set(census1.items()) ^ set(census0.items())
        )[:5]
        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(
            "compaction aborted: source tree changed after the snapshot "
            f"(writer contract violated; first diffs: {changed}); live "
            f"tree at {path} is untouched"
        )
    newdir = os.path.join(vroot, f"v{nxt:06d}")
    try:
        os.rename(stage, newdir)
    except OSError:
        # Concurrent-compactor race: another process published this
        # version slot between our listing and our rename. Same
        # doctrine as the layout builds — the loser discards its work
        # and reads the winner (the tree is compacted either way).
        shutil.rmtree(stage, ignore_errors=True)
        if not os.path.isdir(newdir):
            raise  # a real failure, not a race
        recover_layout(path)
        after = partition_file_stats(path, part_col)
        return {
            "files_before": files_before,
            "files_after": sum(n for n, _ in after.values()),
            "rows": rows,
            "version": nxt,
            "lost_race_to_peer": True,
        }

    if migrating:
        # one-time migration: archive the live plain directory as the
        # previous version, then put the pointer in place. The only
        # window in which ``path`` is briefly absent — ever; a crash
        # here is healed by recover_layout on the next call.
        os.rename(path, os.path.join(vroot, f"v{nxt - 1:06d}"))
    tmp = f"{path}.lnk.{os.getpid()}"
    if os.path.lexists(tmp):
        os.remove(tmp)
    os.symlink(newdir, tmp)
    os.rename(tmp, path)  # atomic pointer flip (replaces old symlink)
    try:  # drop any cached file listings planned over the old pointer
        spark.catalog.refreshByPath(path)
    except Exception:  # noqa: BLE001 — refresh is best-effort
        pass

    # prune old versions, always retaining the newest ``keep_versions``
    # (the previous version keeps in-flight readers alive post-flip)
    for d in _list_versions(vroot)[:-max(1, keep_versions)]:
        shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)

    after = partition_file_stats(path, part_col)
    return {
        "files_before": files_before,
        "files_after": sum(n for n, _ in after.values()),
        "rows": rows,
        "version": nxt,
    }
