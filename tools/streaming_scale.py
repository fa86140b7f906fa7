"""Streaming decade evidence (VERDICT r14 #4) — replay the events
corpus through the three stateful streaming queries with a bounded
trigger loop and record per-batch wall + state-store size vs batch
index, per decade.

Protocol: the events table is re-written as ``n_batches``
range-partitioned-by-ts files with ascending mtimes (the file source
replays them in order — arrival order == event-time order, the shape
a real ingest has), then each query runs with
``maxFilesPerTrigger=1`` + ``trigger(availableNow)`` against a noop
sink. Per-batch numbers come from the query's own progress events
(triggerExecution wall, stateOperators numRowsTotal /
memoryUsedBytes) — the same numbers a production monitor scrapes.

Usage: python tools/streaming_scale.py <events_dir_or_sf_dir> [n_batches=24] [provider]
``provider``: "rocksdb" routes state through RocksDBStateStoreProvider
— the first rung of the sessionization-state mitigation ladder (state
spills to executor-local disk instead of living on the JVM heap;
``memoryUsedBytes`` then reports the block-cache/memtable footprint,
not rows × bytes). Default is the in-memory HDFSBackedStateStore.
Prints one JSON line per batch and a summary line per query.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _prep_batches(spark, src: str, dst: str, n_batches: int) -> int:
    """Rewrite events as n time-ordered files with ascending mtimes."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(src).select("event_id", "ts", "user_id",
                                        "event_type", "value")
    n = ev.count()
    (
        ev.repartitionByRange(n_batches, F.col("ts"), F.col("event_id"))
        .write.mode("overwrite")
        .parquet(dst)
    )
    parts = sorted(
        f for f in os.listdir(dst) if f.endswith(".parquet")
    )  # part-00000.. = range-partition order = ts order
    base = time.time()
    for i, f in enumerate(parts):
        os.utime(os.path.join(dst, f), (base + i, base + i))
    return n


def _run(spark, name: str, out_df, output_mode: str, ckpt: str) -> dict:
    q = (
        out_df.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = []
    for p in q.recentProgress:
        if p is None or p.get("numInputRows", 0) == 0 and not p.get("stateOperators"):
            continue
        st = p.get("stateOperators") or [{}]
        batches.append(
            {
                "batch": p.get("batchId"),
                "rows": p.get("numInputRows"),
                "wall_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "state_rows": st[0].get("numRowsTotal"),
                "state_bytes": st[0].get("memoryUsedBytes"),
            }
        )
    for b in batches:
        print(json.dumps({"query": name, **b}), flush=True)
    walls = [b["wall_ms"] for b in batches if b["wall_ms"] is not None]
    summary = {
        "metric": "streaming_scale",
        "query": name,
        "n_batches": len(batches),
        "total_wall_s": round(sum(walls) / 1000.0, 2) if walls else None,
        "max_batch_wall_ms": max(walls) if walls else None,
        "final_state_rows": batches[-1]["state_rows"] if batches else None,
        "max_state_bytes": max(
            (b["state_bytes"] or 0) for b in batches
        ) if batches else None,
    }
    print(json.dumps(summary), flush=True)
    return summary


def main() -> int:
    src = sys.argv[1]
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    provider = sys.argv[3].lower() if len(sys.argv) > 3 else "hdfs"
    if os.path.isdir(os.path.join(src, "events.parquet")) or os.path.exists(
        os.path.join(src, "events.parquet")
    ):
        src = os.path.join(src, "events.parquet")

    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.streaming.events import (
        read_events_stream,
        sessionized_event_counts,
        streaming_cusum_drift,
        windowed_event_counts,
    )

    conf = {"spark.ui.showConsoleProgress": "false"}
    if provider == "rocksdb":
        conf["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    spark = get_spark(
        "streaming-scale",
        extra_conf=conf,
    )
    print(json.dumps({"state_store_provider": provider}), flush=True)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_scale_")
    try:
        batch_dir = os.path.join(work, "batches")
        n = _prep_batches(spark, src, batch_dir, n_batches)
        print(json.dumps({"source": src, "rows": n, "n_batches": n_batches}),
              flush=True)
        schema = spark.read.parquet(batch_dir).schema

        def stream():
            return read_events_stream(
                spark, batch_dir, schema, max_files_per_trigger=1
            )

        _run(
            spark,
            "stream_hourly_counts",
            windowed_event_counts(stream(), window="1 hour",
                                  watermark="2 hours"),
            "append",
            os.path.join(work, "ck_hourly"),
        )
        _run(
            spark,
            "stream_sessionized_counts",
            sessionized_event_counts(stream(), gap="30 minutes",
                                     watermark="2 hours"),
            "append",
            os.path.join(work, "ck_sessions"),
        )
        _run(
            spark,
            "streaming_cusum_drift",
            streaming_cusum_drift(stream(), 50_000_000, 10**9),
            "update",
            os.path.join(work, "ck_cusum"),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
