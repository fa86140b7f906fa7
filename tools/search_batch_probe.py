"""bm25/qld standing-workload probe (VERDICT r15 #6).

The registry's search_bm25_topk / search_qld_topk score a 3-query
batch; their per-query top-k runs as a window over query_id. Spark
4's WindowGroupLimit already performs two-level top-k (a PARTIAL
rank-limit per map partition before the exchange, a FINAL one after),
so the exchange carries at most k rows per (query, map partition) —
the property a 10^4-query standing workload needs. This probe
measures it instead of assuming it: synthesize N-query batches from
the corpus' own frequent tokens (so every query matches documents),
time the full scorer at each N on the same corpus, and record the
wall + the plan's WindowGroupLimit/Exchange shape.

Usage: python tools/search_batch_probe.py [sf_dir] [n_list] [repeats]
Defaults: /root/testdata/sf0.1  10,100,1000  2
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_list = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "10,100,1000").split(",")]
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from pyspark.sql import functions as F

    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.operators import search

    spark = get_spark("search-batch-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # Vocabulary sample: the corpus' most frequent tokens (bounded by
    # the one-scan scorer's MAX_SCAN_TERMS contract). Deterministic.
    vocab = [
        r["tok"]
        for r in (
            docs.select(F.explode(F.split("text", r"\s+")).alias("tok"))
            .filter(F.col("tok") != "")
            .groupBy("tok").count()
            .orderBy(F.desc("count"), F.asc("tok"))
            .limit(search.MAX_SCAN_TERMS // 2)
            .collect()
        )
    ]

    def batch(n: int) -> list[tuple[str, str]]:
        # two terms per query, cycling the vocab sample — every query
        # matches real documents, distinct terms stay <= |vocab|.
        out = []
        for i in range(n):
            out.append((f"q{i:05d}", vocab[(2 * i) % len(vocab)]))
            out.append((f"q{i:05d}", vocab[(2 * i + 1) % len(vocab)]))
        return out

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    results = {}
    for fn_name, fn in (("bm25_topk", search.bm25_topk), ("qld_topk", search.qld_topk)):
        per_n = {}
        for n in n_list:
            qb = batch(n)
            spark.sparkContext.setJobDescription(f"{fn_name} batch n={n}")
            walls = []
            for _ in range(repeats):
                t0 = time.time()
                noop(fn(docs, qb, k=10))
                walls.append(round(time.time() - t0, 3))
            plan = fn(docs, qb, k=10)._jdf.queryExecution().executedPlan().toString()
            per_n[n] = {
                "wall_sec": min(walls),
                "walls": walls,
                "n_window_group_limit": plan.count("WindowGroupLimit"),
                "n_exchange": plan.count("Exchange"),
            }
        results[fn_name] = per_n
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf_dir": sf_dir, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
