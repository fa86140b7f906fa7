"""Structured Streaming operators (north-star extension).

The reference is pure batch (SURVEY.md §2.8 "not present"), but a
training-data engine ingests continuously; these are the streaming
twins of the batch event/text operators. Each takes/returns streaming
DataFrames so sources and sinks stay caller-controlled (tests use an
in-memory sink; production uses Kafka/files + checkpointing).

Scale notes: watermarks bound state; the windowed counts are
partial-aggregated before the shuffle exactly like the batch groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diagnosisextraction_ml_spark.operators.textstats import quality_score


def read_events_stream(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over an events-shaped directory."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-type sliding-window event counts with late-data watermark."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_quality_filter(docs: DataFrame, min_quality: float = 0.3) -> DataFrame:
    """Streaming text-quality gate — same expression as the batch op,
    applied to a stream (stateless map/filter: no watermark needed)."""
    return docs.withColumn("quality", quality_score(F.col("text"))).filter(
        F.col("quality") >= min_quality
    )
