"""Generate PLAN_FINGERPRINTS.json — a physical-plan-shape snapshot of
every registered query.

Each fingerprint is the count of the scale-relevant operator kinds in
the query's (pre-execution, AQE-initial) physical plan at sf0.001:
join strategies, exchange kinds, windows, top-k, generators, and
Python-eval nodes. These counts are deterministic for a fixed Spark
version, fixed testdata, and fixed code — file-size-based broadcast
decisions, join order, and window placement are all pinned by them —
so tests/test_plans.py::test_plan_fingerprints_unchanged turns EVERY
unintended plan regression in ANY query into a named diff, the
closed-class version of the individual shape tests.

After an INTENTIONAL plan change, regenerate and commit:
    python tools/plan_fingerprints.py          # rewrites the JSON
    python tools/plan_fingerprints.py --check  # exit 1 on any diff

The session must match tests/conftest.py (local[4], shuffle=4):
operator COUNTS don't depend on partition numbers, but keeping the
environments identical removes a class of head-scratchers.
"""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

FINGERPRINT_FILE = os.path.join(_REPO_ROOT, "PLAN_FINGERPRINTS.json")
SF_DIR = "/root/testdata/sf0.001"

# Operator kinds that define a plan's scale shape. Substring counts
# over executedPlan().toString(); "Window [" excludes WindowGroupLimit.
FP_OPS = [
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange hashpartitioning",
    "Exchange SinglePartition",
    "Exchange rangepartitioning",
    "Window [",
    "WindowGroupLimit",
    "TakeOrderedAndProject",
    "Generate",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
]


def fingerprint(plan: str) -> dict[str, int]:
    return {op: plan.count(op) for op in FP_OPS if op in plan}


def compute_all(spark, sf_dir: str = SF_DIR) -> dict[str, dict[str, int]]:
    from diagnosisextraction_ml_spark.plans.queries import queries

    out: dict[str, dict[str, int]] = {}
    for name, fn in queries().items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out[name] = fingerprint(plan)
    return dict(sorted(out.items()))


def main() -> int:
    check = "--check" in sys.argv

    from diagnosisextraction_ml_spark import get_spark

    spark = get_spark("plan-fingerprints", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    current = compute_all(spark)
    if check:
        with open(FINGERPRINT_FILE) as f:
            committed = json.load(f)
        bad = []
        for name in sorted(set(committed) | set(current)):
            if committed.get(name) != current.get(name):
                bad.append(name)
                print(f"DIFF {name}:")
                print(f"  committed: {committed.get(name)}")
                print(f"  current:   {current.get(name)}")
        print(f"{len(current) - len(bad)}/{len(current)} fingerprints match")
        return 1 if bad else 0
    with open(FINGERPRINT_FILE, "w") as f:
        json.dump(current, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(current)} fingerprints to {FINGERPRINT_FILE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
