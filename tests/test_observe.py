"""observe_qc — QC counters that ride an existing action (no extra scan).

All observations here run in a CHILD session (spark.newSession()):
Spark 4.1.2's per-session ObservationManager, once it has registered
any observation, breaks later MLlib fits in the same session with
NotSerializableException (see observe_qc's docstring — repro'd on this
box; plain DataFrame jobs are unaffected). The child session shares
the SparkContext but isolates that state, keeping the suite's shared
session clean for the ML/e2e tests that follow alphabetically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.operators.profile import observe_qc


@pytest.fixture()
def obs_spark(spark):
    return spark.newSession()


def test_observe_qc_counts_violations_on_the_write_pass(obs_spark, sf_dir):
    events = obs_spark.read.parquet(f"{sf_dir}/events.parquet")
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


def test_observe_qc_reflects_delivered_rows_after_filter(obs_spark, sf_dir):
    """Observation placed AFTER a filter certifies what was delivered,
    not what was scanned."""
    docs = obs_spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = docs.filter(F.length("text") > 100)
    observed, obs = observe_qc(kept, {"null_text": F.col("text").isNull()}, "gate")
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] == kept.count()
    assert obs.get["null_text"] == 0


def test_observation_session_isolation_keeps_ml_fits_healthy(spark, sf_dir):
    """Pin the Spark 4.1.2 interaction this file works around: after an
    observation in a CHILD session, an MLlib fit in the PARENT session
    must still work (the per-session ObservationManager never enters
    the parent's closures). If this ever fails, the newSession()
    guidance in observe_qc's docstring needs rethinking."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    child = spark.newSession()
    events = child.read.parquet(f"{sf_dir}/events.parquet")
    observed, obs = observe_qc(events, {"null_user": F.col("user_id").isNull()})
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] > 0

    df = spark.createDataFrame(
        [(float(i % 2), float(i), float(2 * i)) for i in range(40)],
        "label double, x double, y double",
    )
    va = VectorAssembler(inputCols=["x", "y"], outputCol="features")
    model = LogisticRegression(maxIter=2).fit(va.transform(df))
    assert model.numFeatures == 2


def test_write_training_shards_with_qc_rules_certifies_the_write(
    obs_spark, sf_dir, tmp_path
):
    """qc_rules on write_training_shards: the observed counters must
    equal an independent recount of the files actually written — the
    QC rode the sink action itself, no second scan of the source."""
    import pyspark.sql.functions as F

    from diagnosisextraction_ml_spark.sources.writers import (
        write_training_shards,
    )

    docs = obs_spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "shards")
    n, metrics = write_training_shards(
        docs,
        out,
        "doc_id",
        n_shards=5,
        qc_rules={
            "short_text": F.length("text") < 20,
            "null_lang": F.col("lang").isNull(),
        },
    )
    assert n == 5
    written = obs_spark.read.parquet(out)
    recount = written.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum((F.length("text") < 20).cast("long")).alias("short_text"),
        F.sum(F.col("lang").isNull().cast("long")).alias("null_lang"),
    ).collect()[0]
    assert metrics["rows"] == recount["rows"]
    assert metrics["short_text"] == (recount["short_text"] or 0)
    assert metrics["null_lang"] == (recount["null_lang"] or 0)
    # without rules the return type is unchanged (int)
    n2 = write_training_shards(docs, str(tmp_path / "s2"), "doc_id", n_shards=3)
    assert n2 == 3
