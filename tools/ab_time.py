"""Min-of-2 noop timings for a list of registered queries.

Usage: python tools/ab_time.py <sf_dir> name [name ...]
Prints one line per query: <name> <best_sec>. The guide §1.4 noop sink,
same methodology as bench.py but without the anchor/layout machinery —
the per-change A/B harness for this optimization round.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.plans.queries import queries

    spark = get_spark("ab-time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    # warm: one full pass at the smallest sf (JIT, codec, Arrow paths)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for n in names:
        try:
            qs[n](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass
    for n in names:
        best = None
        for _ in range(2):
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"ab:{n}")
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            w = time.time() - t0
            best = w if best is None or w < best else best
        print(f"{n} {best:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
