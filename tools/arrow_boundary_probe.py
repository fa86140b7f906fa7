"""Arrow/Python-boundary measurement (VERDICT r15 #8).

The three Python-boundary text ops (text_stemmed, text_typo_corrected,
text_nfc_normalized) plan exactly ONE ArrowEvalPython node each (the
r15 log's "ArrowEvalPython ×2" was the formatted-explain listing every
node twice — tree line + detail block; there is no duplicated
evaluation to checkpoint away). What remains is the §4 boundary cost
itself: serialize the column to Arrow, run the pandas UDF, bring the
result back. This probe MEASURES that at two scales instead of
assuming it: each op vs a JVM-only control of identical scan+project
shape (upper(text) — same bytes through one codegen projection, no
Python), so (op − control) ≈ Python-side CPU + boundary transfer.

Usage: python tools/arrow_boundary_probe.py [sf_dir] [repeats=3]
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
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.plans.queries import queries

    spark = get_spark("arrow-boundary-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def timed(label, build):
        walls = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(label)
            t0 = time.time()
            noop(build())
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        return {"wall_sec": min(walls), "walls": walls}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = {"sf_dir": sf_dir}
    out["control_jvm_upper"] = timed(
        "control: scan+project upper(text)",
        lambda: docs.select("doc_id", F.upper("text").alias("u")),
    )
    for name in ("text_stemmed", "text_nfc_normalized", "text_typo_corrected"):
        fn = qs[name]
        out[name] = timed(name, lambda fn=fn: fn(spark, sf_dir))
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out[name]["n_arrow_eval_python"] = plan.count("ArrowEvalPython")
        out[name]["n_batch_eval_python"] = plan.count("BatchEvalPython")

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
