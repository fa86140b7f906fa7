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
- The rewrite lands in a staging directory and is swapped in with two
  renames (live → trash, staging → live). The swap window is not
  atomic; this is the standard maintenance-window trade, and the
  layout readers in this repo (plans/queries._partitioned_fact) fall
  back to the plain source scan whenever the directory is missing, so
  a reader hitting the window degrades to a slower correct scan,
  never a wrong or failed one.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def partition_file_stats(path: str, part_col: str) -> dict[str, tuple[int, int]]:
    """Per partition-value (n_files, total_bytes) from the directory
    tree. Local-filesystem listing; on a cluster store, do the same
    walk through the Hadoop FileSystem API."""
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


def compact_partitioned(
    spark: SparkSession,
    path: str,
    part_col: str,
    max_records_per_file: int = 5_000_000,
) -> dict[str, int]:
    """Rewrite the partitioned parquet tree at ``path`` with ~1 file
    per partition value (``max_records_per_file`` caps oversized
    ones). Returns {"files_before": n, "files_after": m,
    "rows": total}. Layout, schema, and row set are unchanged —
    only the file granularity."""
    before = partition_file_stats(path, part_col)
    files_before = sum(n for n, _ in before.values())
    df = spark.read.parquet(path)
    rows = df.count()

    stage = f"{path}.compact.{os.getpid()}"
    trash = f"{path}.trash.{os.getpid()}"
    shutil.rmtree(stage, ignore_errors=True)
    (
        df.repartition(F.col(part_col))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(part_col)
        .parquet(stage)
    )
    # two-rename swap (see module docstring for the window semantics)
    os.rename(path, trash)
    try:
        os.rename(stage, path)
    except OSError:
        os.rename(trash, path)  # restore the live tree, then re-raise
        shutil.rmtree(stage, ignore_errors=True)
        raise
    shutil.rmtree(trash, ignore_errors=True)

    after = partition_file_stats(path, part_col)
    return {
        "files_before": files_before,
        "files_after": sum(n for n, _ in after.values()),
        "rows": rows,
    }
