"""observe_qc — QC counters that ride an existing action (no extra scan)."""

from __future__ import annotations

import pyspark.sql.functions as F

from diagnosisextraction_ml_spark.operators.profile import observe_qc


def test_observe_qc_counts_violations_on_the_write_pass(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    observed, obs = observe_qc(
        events,
        {
            "null_user": F.col("user_id").isNull(),
            "nonpositive_value": F.col("value") <= 0,
        },
    )
    # the only action is the sink write — the metrics ride it
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["rows"] == events.count()
    # exact parity with a dedicated aggregation pass
    ded = events.agg(
        F.sum(F.col("user_id").isNull().cast("long")).alias("nu"),
        F.sum((F.col("value") <= 0).cast("long")).alias("np"),
    ).collect()[0]
    assert got["null_user"] == (ded["nu"] or 0)
    assert got["nonpositive_value"] == (ded["np"] or 0)


def test_observe_qc_reflects_delivered_rows_after_filter(spark, sf_dir):
    """Observation placed AFTER a filter certifies what was delivered,
    not what was scanned."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = docs.filter(F.length("text") > 100)
    observed, obs = observe_qc(kept, {"null_text": F.col("text").isNull()}, "gate")
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] == kept.count()
    assert obs.get["null_text"] == 0
