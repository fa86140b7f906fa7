"""Seeded randomized corpora vs brute-force Python models.

Each test builds a random-but-deterministic input (stdlib Random with
a fixed seed), computes the expected result with a straight-line
Python model of the documented semantics, and requires the distributed
operator to match exactly — one Spark job per test, but covering input
shapes hand-written fixtures miss (overlaps, collisions, ties, empty
groups)."""

from __future__ import annotations

import datetime as dt
import random
from collections import Counter, defaultdict

import pyspark.sql.functions as F
import pytest

from diagnosisextraction_ml_spark.operators import sketch
from diagnosisextraction_ml_spark.operators.dedup import remove_duplicated_spans
from diagnosisextraction_ml_spark.operators.rollup import hourly_rollup, merge_rollup
from diagnosisextraction_ml_spark.operators.upsert import upsert_latest

VOCAB = [f"w{i}" for i in range(30)]


def _random_docs(seed, n_docs=40, max_len=25):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        toks = [rng.choice(VOCAB) for _ in range(rng.randint(0, max_len))]
        docs.append((i, " ".join(toks)))
    # inject verbatim span copies so duplicated grams exist
    for i in range(0, n_docs, 7):
        if docs[i][1]:
            j = (i + 3) % n_docs
            docs[j] = (j, docs[j][1] + " " + docs[i][1])
    return docs


def _span_removal_model(docs, n, min_count=2):
    grams = Counter()
    toks_by_doc = {}
    for doc_id, text in docs:
        toks = [t for t in text.lower().split() if t]
        toks_by_doc[doc_id] = toks
        for p in range(len(toks) - n + 1):
            grams[" ".join(toks[p : p + n])] += 1
    out = {}
    for doc_id, toks in toks_by_doc.items():
        covered = set()
        for p in range(len(toks) - n + 1):
            if grams[" ".join(toks[p : p + n])] >= min_count:
                covered.update(range(p, p + n))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[doc_id] = (len(toks), len(covered), " ".join(kept))
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_span_removal_matches_brute_force(spark, seed):
    docs = _random_docs(seed)
    expected = _span_removal_model(docs, n=4)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
        for r in remove_duplicated_spans(df, n=4).collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [11, 12])
def test_cms_matches_brute_force_grid(spark, seed):
    # brute-force model shares the md5 cell function via the operator's
    # own cms_cell run through Spark once on the distinct tokens
    docs = _random_docs(seed, n_docs=25)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = Counter(
        t for _, text in docs for t in text.lower().split() if t
    )
    # cell assignments, computed once via the same expression
    tok_df = spark.createDataFrame([(t,) for t in exact], "token string")
    cells = {
        (r.token, r.r): r.c
        for rr in range(sketch.DEPTH)
        for r in tok_df.select(
            "token",
            F.lit(rr).alias("r"),
            sketch.cms_cell(F.col("token"), rr).alias("c"),
        ).collect()
    }
    grid = defaultdict(int)
    for t, n in exact.items():
        for rr in range(sketch.DEPTH):
            grid[(rr, cells[(t, rr)])] += n
    got = {
        (r.cms_row, r.cms_col): r.cnt for r in sketch.cms_build(df).collect()
    }
    assert got == dict(grid)
    # and estimates = min over rows of the model grid
    est = sketch.cms_estimate(
        sketch.cms_build(df), tok_df
    ).collect()
    for r in est:
        want = min(grid[(rr, cells[(r.token, rr)])] for rr in range(sketch.DEPTH))
        assert r.cms_est == want
        assert r.cms_est >= exact[r.token]


@pytest.mark.parametrize("seed", [21, 22])
def test_upsert_matches_replay(spark, seed):
    rng = random.Random(seed)
    rows = []
    for uid in range(200):
        rows.append(
            (
                rng.randint(0, 30),  # key with collisions
                dt.datetime(2024, 1, 1, rng.randint(0, 23), rng.randint(0, 59)),
                uid,
                rng.choice("abcde"),
            )
        )
    # python replay: max by (ts, uid)
    best = {}
    for k, ts, uid, state in rows:
        if k not in best or (ts, uid) > (best[k][0], best[k][1]):
            best[k] = (ts, uid, state)
    df = spark.createDataFrame(rows, "k long, ts timestamp, uid long, state string")
    cut = len(rows) // 2
    a = spark.createDataFrame(rows[:cut], "k long, ts timestamp, uid long, state string")
    b = spark.createDataFrame(rows[cut:], "k long, ts timestamp, uid long, state string")
    snap = upsert_latest(a.limit(0), a, ["k"], ["ts"], ["uid"], ["state"])
    merged = upsert_latest(snap, b, ["k"], ["ts"], ["uid"], ["state"])
    got = {r.k: (r.ts, r.uid, r.state) for r in merged.collect()}
    assert got == best


@pytest.mark.parametrize("seed", [31])
def test_rollup_matches_replay(spark, seed):
    rng = random.Random(seed)
    rows = [
        (
            i,
            dt.datetime(2024, 1, 1, rng.randint(0, 5), rng.randint(0, 59)),
            rng.choice(["x", "y"]),
            round(rng.uniform(-5, 5), 4),
        )
        for i in range(500)
    ]
    model = defaultdict(lambda: [0, 0.0, None, None])
    for _, ts, et, v in rows:
        key = (ts.replace(minute=0, second=0, microsecond=0), et)
        m = model[key]
        m[0] += 1
        m[1] = round(m[1] + v, 6)
        m[2] = v if m[2] is None else min(m[2], v)
        m[3] = v if m[3] is None else max(m[3], v)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, et string, value double"
    )
    a = df.filter(F.col("event_id") % 2 == 0)
    b = df.filter(F.col("event_id") % 2 == 1)
    merged = merge_rollup(
        hourly_rollup(a, dims=["et"]), hourly_rollup(b, dims=["et"]), dims=["et"]
    )
    for r in merged.collect():
        n, s, lo, hi = model[(r.window_start, r.et)]
        assert r.n == n
        assert float(r.sum_value) == pytest.approx(s, abs=1e-6)
        assert float(r.min_value) == pytest.approx(lo, abs=1e-6)
        assert float(r.max_value) == pytest.approx(hi, abs=1e-6)
