"""SemDeDup at scale with the paper's k ∝ n rule — the decade knob.

The registered ``pipeline_text_semdedup`` pins k=32 so its DuckDB
twin replays hash-exactly, and 32 clusters are right for the ≤60k-doc
oracle corpora. At the third decade that constant becomes the
bottleneck: the within-cluster pair scan costs ~n²/k comparisons, so
5M docs over 32 clusters is ~160k-doc clusters and ~10^12 pair
cosines. SemDeDup (Abbas et al. 2023) scales k with the corpus for
exactly this reason (the ``semantic_dedup`` docstring records the
rule); this tool measures the pipeline with ``k = max(32, n /
docs_per_cluster)`` so the per-cluster work stays bounded while the
clustering cost (n·k cosine argmins) grows gently.

Usage: python tools/semdedup_scale.py <sf_dir> [docs_per_cluster=2000] [repeats=1] [k] [probe]
``probe`` (optional) routes every assignment pass through the
IVF-pruned approximate argmin (assign_nearest_centroid_pruned) — the
measured fix for the n·k assignment wall this tool exposed at sf100.
Prints per-stage JSON lines and a summary line for PERF.md.
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
    sf_dir = sys.argv[1]
    per_cluster = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    k_override = int(sys.argv[4]) if len(sys.argv) > 4 else None
    probe = int(sys.argv[5]) if len(sys.argv) > 5 else None

    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.operators.dedup import semantic_dedup
    from diagnosisextraction_ml_spark.operators.similarity import srp_embed_text
    from diagnosisextraction_ml_spark.sources.readers import load_table

    spark = get_spark(
        "semdedup-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    k = k_override if k_override is not None else max(32, n // per_cluster)
    print(json.dumps({"sf_dir": sf_dir, "n_docs": n, "k": k, "probe": probe}), flush=True)

    best = None
    for r in range(repeats):
        t0 = time.time()
        emb = srp_embed_text(docs, dim=16).withColumnRenamed("doc_id", "vec_id")
        emb = emb.localCheckpoint()
        t_feat = time.time() - t0
        t1 = time.time()
        out = semantic_dedup(emb, k=k, iters=2, tau=0.99, assign_probe=probe)
        out.write.format("noop").mode("overwrite").save()
        t_dedup = time.time() - t1
        wall = time.time() - t0
        best = wall if best is None else min(best, wall)
        print(
            json.dumps(
                {"pass": r, "featurize_sec": round(t_feat, 2),
                 "cluster_dedup_sec": round(t_dedup, 2),
                 "wall_sec": round(wall, 2)}
            ),
            flush=True,
        )
    print(
        json.dumps(
            {"metric": "semdedup_scale", "sf_dir": sf_dir, "n_docs": n,
             "k": k, "probe": probe, "docs_per_cluster_target": per_cluster,
             "best_wall_sec": round(best, 2)}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
