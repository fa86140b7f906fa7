"""Dump .explain("formatted") for headline queries into plans/r16/.

Usage: python tools/plans_r16.py <suffix> [name ...]

With no names, dumps every bench.py HEADLINE query. Writes
plans/r16/<query>_<suffix>.txt (suffix = before|after).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.plans.queries import queries

    if not names:
        names = list(HEADLINE)

    out_dir = os.path.join(_REPO_ROOT, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP unknown {name}")
            continue
        buf = io.StringIO()
        try:
            df = fn(spark, sf_dir)
            with redirect_stdout(buf):
                df.explain("formatted")
        except Exception as e:  # noqa: BLE001 — audit tool, keep going
            buf.write(f"ERROR: {e}\n")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
