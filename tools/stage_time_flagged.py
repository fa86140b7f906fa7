"""Stage-time the six queries flagged >2x their DuckDB twin (r14).

VERDICT r14 #1: split each flagged query's cost into the fixed
job-launch floor and reducible plan work, at sf0.1 on local[32] —
the same regime bench.py measures. Every number is min-of-2 in one
session (the repo's standard steady-state estimator).

Usage: python tools/stage_time_flagged.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        w = time.time() - t0
        best = w if best is None or w < best else best
    return round(best, 3)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.operators import dedup, graph
    from diagnosisextraction_ml_spark.plans.queries import queries

    spark = get_spark("stage-time")
    qs = queries()
    out: dict[str, dict] = {}

    # ---- fixed floors ----------------------------------------------------
    rng = spark.range(1_000_000)
    out["floors"] = {
        "trivial_job": t(lambda: noop(rng)),
        "trivial_job_32tasks": t(lambda: noop(rng.repartition(32))),
    }

    # ---- pagerank: marginal per-iteration cost ---------------------------
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    pr = {}
    for n_iter in (0, 1, 3, 5):
        pr[f"n_iter={n_iter}"] = t(
            lambda n=n_iter: noop(
                graph.pagerank_top(edges, n_iter=n, k=20, symmetric=True)
            )
        )
    out["graph_pagerank_top"] = pr

    # ---- LSH banding: cumulative pipeline stages -------------------------
    from diagnosisextraction_ml_spark.plans.queries_ext import _dup_union

    corpus = _dup_union(spark, sf_dir)
    reps = corpus.groupBy(
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("__fp")
    ).agg(
        F.array_sort(F.collect_list("doc_id")).alias("__members"),
        F.min("text").alias("text"),
    )
    lsh = {
        "corpus_scan": t(lambda: noop(corpus)),
        "collapse_exact_reps": t(lambda: noop(reps)),
        "reps_plus_minhash_wide": t(
            lambda: noop(
                dedup._minhash_wide(
                    reps.select(F.col("__members")[0].alias("doc_id"), "text"),
                    "text",
                    "doc_id",
                    3,
                    16,
                )
            )
        ),
        "full_lsh_pairs": t(lambda: noop(qs["dedup_lsh_band_pairs"](spark, sf_dir))),
    }
    out["dedup_lsh_band_pairs"] = lsh

    # ---- split leakage (same LSH pass + fold projection) ------------------
    out["qc_split_leakage"] = {
        "full": t(lambda: noop(qs["qc_split_leakage"](spark, sf_dir))),
    }

    # ---- span intervals (aggregate-first plan) -----------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _, dup_pos = dedup._dup_gram_positions(docs, "text", "doc_id", 13, 2)
    out["dedup_span_intervals"] = {
        "dup_gram_positions": t(lambda: noop(dup_pos)),
        "full": t(lambda: noop(qs["dedup_span_intervals"](spark, sf_dir))),
    }

    # ---- assoc rules: basket build vs rest ---------------------------------
    baskets = li.groupBy(F.col("l_orderkey").alias("tx")).agg(
        F.array_sort(F.collect_set(F.col("l_partkey"))).alias("items")
    )
    out["assoc_rules_pairs"] = {
        "basket_build": t(
            lambda: noop(baskets.filter(F.size("items").between(2, 64)))
        ),
        "full": t(lambda: noop(qs["assoc_rules_pairs"](spark, sf_dir))),
    }

    # ---- quality logodds: train pass vs full train+score -------------------
    out["quality_token_logodds"] = {
        "full": t(lambda: noop(qs["quality_token_logodds"](spark, sf_dir))),
    }

    # ---- prefix jaccard: cumulative pipeline stages (r16, VERDICT #3) ------
    # Each step BELOW re-runs its predecessors (fresh lazy plans each
    # call, except the eager checkpoints inside the operator), so read
    # the table as cumulative-cost-through-stage; deltas between rows
    # are the marginal stage costs.
    reps_pj = corpus.groupBy(
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("__fp")
    ).agg(
        F.array_sort(F.collect_list("doc_id")).alias("__members"),
        F.min("text").alias("text"),
    ).select(F.col("__members")[0].alias("doc_id"), "text")

    def _pj_sharr():
        return dedup.shingle_arrays(reps_pj, "text", "doc_id", 3).withColumn(
            "__harr",
            F.array_distinct(F.transform("__grams", lambda g: F.xxhash64(g))),
        )

    def _pj_prefix(sharr):
        from pyspark.sql import Window

        num, den = 4, 5
        hs = sharr.select(
            F.col("doc_id"),
            F.size("__harr").cast("long").alias("sz"),
            F.explode("__harr").alias("__h"),
        )
        wdf = Window.partitionBy("__h")
        wdoc = Window.partitionBy("doc_id").orderBy(F.asc("__df"), F.asc("__h"))
        return (
            hs.withColumn("__df", F.count(F.lit(1)).over(wdf))
            .withColumn("__rn", F.row_number().over(wdoc))
            .filter(
                F.col("__rn")
                <= F.col("sz") - F.expr(f"({num} * sz + {den - 1}) DIV {den}") + F.lit(1)
            )
            .select(F.col("doc_id"), "__h", "sz", "__rn")
        )

    def _pj_cands(prefix):
        a = prefix.select(
            F.col("doc_id").alias("id_a"), "__h",
            F.col("sz").alias("sz_a"), F.col("__rn").alias("rn_a"),
        )
        b = prefix.select(
            F.col("doc_id").alias("id_b"), "__h",
            F.col("sz").alias("sz_b"), F.col("__rn").alias("rn_b"),
        )
        num, den = 4, 5
        return (
            a.join(b, "__h")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(
                F.lit(num) * F.greatest("sz_a", "sz_b")
                <= F.lit(den) * F.least("sz_a", "sz_b")
            )
            .groupBy("id_a", "id_b", "sz_a", "sz_b")
            .agg(F.min("rn_a").alias("__ra"), F.min("rn_b").alias("__rb"))
            .filter(
                F.lit(num + den)
                * (F.lit(1) + F.least(
                    F.col("sz_a") - F.col("__ra"), F.col("sz_b") - F.col("__rb")))
                >= F.lit(num) * (F.col("sz_a") + F.col("sz_b"))
            )
            .select("id_a", "id_b")
        )

    out["dedup_prefix_jaccard_pairs"] = {
        "collapse_exact_reps": t(lambda: noop(reps_pj)),
        "shingle_hash_arrays": t(lambda: noop(_pj_sharr())),
        "prefix_postings": t(lambda: noop(_pj_prefix(_pj_sharr()))),
        "candidates_ppjoin": t(lambda: noop(_pj_cands(_pj_prefix(_pj_sharr())))),
        "full": t(
            lambda: noop(qs["dedup_prefix_jaccard_pairs"](spark, sf_dir))
        ),
    }

    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
