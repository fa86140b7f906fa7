"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and
order-insensitive values (exact, with a fallback tolerance report so
float-hash risks are visible before the driver sees them).

Usage: python tools/compare_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def canon(rows, colnames):
    out = []
    for row in rows:
        vals = dict(zip(colnames, row))
        out.append(tuple(vals[c] for c in sorted(colnames)))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def approx_eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.plans.queries import oracle_sql, queries

    spark = get_spark("oracle-compare")
    con = duckdb.connect()
    import os

    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        # driver testdata ships single-file parquet; Spark writers (e.g.
        # tools/gen_sf.py output) produce <table>.parquet/ directories
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"skip  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            drows = res.fetchall()
            dcols = [d[0] for d in res.description]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        status = []
        if sorted(scols) != sorted(dcols):
            status.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        else:
            # surface integer-width / type drift even when values match —
            # a type-sensitive driver hash would trip on these.
            stypes = dict(sdf.dtypes)
            dtypes = {d[0]: str(d[1]) for d in res.description}
            int_drift = [
                (c, stypes.get(c), dtypes.get(c))
                for c in scols
                if (stypes.get(c) == "int" and "BIGINT" in str(dtypes.get(c, "")).upper())
                or (stypes.get(c) == "bigint" and str(dtypes.get(c, "")).upper() in ("INTEGER", "HUGEINT"))
            ]
            if int_drift:
                print(f"note  {name}: integer-width drift {int_drift}")
        if len(srows) != len(drows):
            status.append(f"rows {len(srows)} vs {len(drows)}")
        if not status:
            cs, cd = canon(srows, scols), canon(drows, dcols)
            exact = cs == cd
            if not exact:
                near = all(
                    all(approx_eq(a, b) for a, b in zip(ra, rb)) for ra, rb in zip(cs, cd)
                )
                if near:
                    status.append("APPROX-ONLY (float drift — hash would fail)")
                    for ra, rb in zip(cs, cd):
                        if ra != rb:
                            status.append(f"   e.g. {ra} vs {rb}")
                            break
                else:
                    status.append("VALUES differ")
                    seen = 0
                    for ra, rb in zip(cs, cd):
                        if ra != rb and seen < 3:
                            status.append(f"   {ra}\n   vs {rb}")
                            seen += 1
        if status:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(status[:5]))
        else:
            print(f"ok    {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
