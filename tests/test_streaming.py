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


def test_stateful_user_totals(spark, sf_dir, tmp_path):
    from diagnosisextraction_ml_spark.streaming.events import stateful_user_totals

    path, schema = _events_dir(spark, sf_dir, tmp_path)
    stream = read_events_stream(spark, path, schema, max_files_per_trigger=1)
    out = stateful_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # the last update per user must equal the batch ground truth
    import pyspark.sql.functions as F

    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql(
            "SELECT user_id, n_events, total_value FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn"
            "  FROM user_totals) WHERE rn = 1"
        ).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in spark.read.parquet(path)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6


def test_streaming_dedup_exact(spark, tmp_path):
    from diagnosisextraction_ml_spark.streaming.events import streaming_dedup_exact

    docs = spark.createDataFrame(
        [(1, "same  text"), (2, "same text"), (3, "other text")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "dedup_docs")
    docs.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    out = streaming_dedup_exact(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id FROM dedup_stream").collect()
    ids = sorted(r["doc_id"] for r in rows)
    # one of the whitespace-equal pair survives, plus the distinct doc
    assert len(ids) == 2 and 3 in ids and (1 in ids or 2 in ids)
