"""Hashed linear quality classifier — closed-form fit, exact scoring."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from diagnosisextraction_ml_spark.operators.quality_model import (
    fit_token_logodds,
    score_token_logodds,
)


def _tiny_corpus(spark):
    rows = [
        (0, "good clean prose flows here", 1),
        (1, "good prose reads well here", 1),
        (2, "spam spam buy now spam", 0),
        (3, "buy now cheap spam deal", 0),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_pos long")


def test_weights_match_hand_computed_logodds(spark):
    """weight_micro equals round(1e6 * smoothed log-odds) computed by
    hand from raw token counts (α=1, B=64)."""
    df = _tiny_corpus(spark)
    B = 64
    w = {r["bucket"]: r["weight_micro"] for r in fit_token_logodds(df, "is_pos", n_buckets=B).collect()}

    # recompute expected counts per bucket in python with the same hash
    from diagnosisextraction_ml_spark.functions.hashing import md5_hash64

    tok = df.select(
        "is_pos",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    ).select("is_pos", (md5_hash64(F.col("token")) % B).alias("bucket"))
    counts: dict[int, list[int]] = {}
    for r in tok.collect():
        c = counts.setdefault(r["bucket"], [0, 0])
        c[0] += int(r["is_pos"])
        c[1] += 1 - int(r["is_pos"])
    pos_tot = sum(c[0] for c in counts.values())
    neg_tot = sum(c[1] for c in counts.values())
    assert set(w) == set(counts)
    for bucket, (pos_n, neg_n) in counts.items():
        expected = round(
            1e6
            * (
                math.log(pos_n + 1)
                - math.log(pos_tot + B)
                - math.log(neg_n + 1)
                + math.log(neg_tot + B)
            )
        )
        assert w[bucket] == expected, bucket


def test_scores_separate_classes_and_sum_exactly(spark):
    df = _tiny_corpus(spark)
    weights = fit_token_logodds(df, "is_pos", n_buckets=64)
    scored = {r["doc_id"]: r for r in score_token_logodds(df, weights, n_buckets=64).collect()}
    # training docs separate: positive-class docs score > negative-class
    assert min(scored[0]["score"], scored[1]["score"]) > max(
        scored[2]["score"], scored[3]["score"]
    )
    assert scored[0]["pred"] == 1 and scored[3]["pred"] == 0
    # score is exactly w_sum / (1e6 * n_tok)
    for r in scored.values():
        assert r["score"] == r["w_sum"] / (1e6 * r["n_tok"])
        assert r["n_tok"] == 5


def test_scoring_is_partitioning_invariant(spark, sf_dir):
    from diagnosisextraction_ml_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    labeled = docs.withColumn("is_pos", (F.col("lang") == "en").cast("long"))
    w = fit_token_logodds(labeled, "is_pos")
    a = sorted(map(tuple, score_token_logodds(docs, w).collect()))
    b = sorted(
        map(
            tuple,
            score_token_logodds(docs.repartition(7), w).collect(),
        )
    )
    assert a == b


def test_unseen_buckets_use_neutral_default(spark):
    df = _tiny_corpus(spark)
    # huge bucket space → the new doc's tokens are (almost surely) unseen
    weights = fit_token_logodds(df, "is_pos", n_buckets=1 << 20)
    new = spark.createDataFrame(
        [(99, "zzzunseen qqqnovel wwwfresh")], "doc_id long, text string"
    )
    r = score_token_logodds(new, weights, n_buckets=1 << 20).collect()[0]
    assert r["w_sum"] == 0 and r["score"] == 0.0 and r["pred"] == 0
    # and a nonzero default shifts the sum by exactly default * n_tok
    r2 = score_token_logodds(
        new, weights, n_buckets=1 << 20, default_weight_micro=-5
    ).collect()[0]
    assert r2["w_sum"] == -15


def test_english_scores_higher_on_testdata(spark, sf_dir):
    """The weak-label classifier actually separates: mean score of
    English documents exceeds mean score of the rest."""
    from diagnosisextraction_ml_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.withColumn("is_pos", (F.col("lang") == "en").cast("long"))
    w = fit_token_logodds(labeled, "is_pos")
    scored = score_token_logodds(docs, w).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r["en"]: r["m"]
        for r in scored.groupBy((F.col("lang") == "en").alias("en"))
        .agg(F.avg("score").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_rowwise_scorer_equals_relational_scorer(spark, sf_dir):
    """The deployment-shape scorer (pandas UDF + weight map, no
    shuffle) reproduces the relational scorer's output exactly."""
    from diagnosisextraction_ml_spark.operators.quality_model import (
        score_token_logodds_rowwise,
        weights_as_map,
    )
    from diagnosisextraction_ml_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(300)
    labeled = docs.withColumn("is_pos", (F.col("lang") == "en").cast("long"))
    w = fit_token_logodds(labeled, "is_pos")
    wm = weights_as_map(w)
    assert 0 < len(wm) <= 4096
    a = sorted(map(tuple, score_token_logodds(docs, w).collect()))
    b = sorted(map(tuple, score_token_logodds_rowwise(docs, wm).collect()))
    assert a == b


def test_rowwise_scorer_streams(spark, sf_dir, tmp_path):
    """Train distributed, deploy to a stream: the rowwise scorer runs
    on readStream unchanged and emits exactly the batch results."""
    from diagnosisextraction_ml_spark.operators.quality_model import (
        score_token_logodds_rowwise,
        weights_as_map,
    )
    from diagnosisextraction_ml_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120).select("doc_id", "text", "lang")
    labeled = docs.withColumn("is_pos", (F.col("lang") == "en").cast("long"))
    wm = weights_as_map(fit_token_logodds(labeled, "is_pos"))

    path = str(tmp_path / "docs_stream")
    docs.repartition(3).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(path)
    out = score_token_logodds_rowwise(stream, wm)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("quality_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT doc_id, n_tok, w_sum, score, pred FROM quality_stream").collect())
    )
    want = sorted(map(tuple, score_token_logodds_rowwise(spark.read.parquet(path), wm).collect()))
    assert got == want and len(got) == 120


def test_rowwise_equals_relational_on_adversarial_texts(spark):
    """Tokenizer-semantics parity between the JVM expression path and
    the Python UDF path on texts chosen to probe the differences:
    unicode NBSP (not whitespace in Java regex OR re.ASCII), tabs/CRLF
    (whitespace in both), empty/whitespace-only docs, repeated
    separators, accents and mixed case."""
    from diagnosisextraction_ml_spark.operators.quality_model import (
        score_token_logodds_rowwise,
        weights_as_map,
    )

    texts = [
        (0, "plain ascii text here", 1),
        (1, "tabs\tand\r\nnewlines   collapse", 1),
        (2, "nbsp stays glued", 0),
        (3, "", 0),
        (4, "   ", 0),
        (5, "MIXED Case TEXT", 1),
        (6, "café naïve déjà-vu", 0),
        (7, "a  b   c    d", 1),
        (8, "trailing spaces   ", 0),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string, is_pos long")
    w = fit_token_logodds(df, "is_pos", n_buckets=512)
    wm = weights_as_map(w)
    rel = {r["doc_id"]: (r["n_tok"], r["w_sum"]) for r in score_token_logodds(df, w, n_buckets=512).collect()}
    row = {r["doc_id"]: (r["n_tok"], r["w_sum"]) for r in score_token_logodds_rowwise(df, wm, n_buckets=512).collect()}
    # relational path drops zero-token docs at the explode; rowwise
    # keeps them with n_tok=0 — compare on the docs both score, and
    # check the rowwise-only ones are exactly the token-free docs
    for k, v in rel.items():
        assert row[k] == v, k
    assert set(row) - set(rel) == {3, 4}
    for k in (3, 4):
        assert row[k] == (0, 0)
