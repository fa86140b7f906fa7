"""Structured Streaming tests — file source → windowed agg → memory
sink with availableNow (bounded) triggers."""

from __future__ import annotations

import pyspark.sql.functions as F

from diagnosisextraction_ml_spark.streaming.events import (
    read_events_stream,
    streaming_quality_filter,
    windowed_event_counts,
)


def _events_dir(spark, sf_dir, tmp_path) -> tuple[str, object]:
    """Re-write the events table as clean parquet (micros timestamps)
    so the stream reader needs no nanos-legacy handling."""
    from diagnosisextraction_ml_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").limit(2000)
    path = str(tmp_path / "events_stream")
    ev.repartition(4).write.mode("overwrite").parquet(path)
    return path, spark.read.parquet(path).schema


def test_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    path, schema = _events_dir(spark, sf_dir, tmp_path)
    stream = read_events_stream(spark, path, schema, max_files_per_trigger=2)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        spark.read.parquet(path)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
    )
    want = {(r["ws"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_streaming_quality_filter(spark, tmp_path):
    import pandas as pd

    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog jumped over it all day"), (2, "!!")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs_stream")
    docs.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    out = streaming_quality_filter(stream, min_quality=0.3)
    q = (
        out.writeStream.format("memory")
        .queryName("quality_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id FROM quality_gate").collect()
    assert [r["doc_id"] for r in rows] == [1]
