"""DuckDB anchor — time the HEADLINE queries' oracle SQL on one machine.

BASELINE.md publishes no reference runtimes, so the driver-sanctioned
performance anchor is DuckDB executing the *same* oracle SQL over the
*same* parquet files bench.py times Spark on. This tool makes that
anchor reproducible instead of an ad-hoc session measurement: it
registers the sf-dir parquet tables as views (the same way the
driver's correctness gate does), runs every HEADLINE query that has an
oracle twin, and prints one JSON line mirroring bench.py's shape.

Usage: python tools/duck_anchor.py [sf_dir] [threads]
Defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1; threads = all.
Queries without an oracle twin (rows-only entries) are skipped and
listed in the output so totals are comparable query-for-query.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def run_anchor(
    sf_dir: str, names: list[str], threads: int | None = None,
    verbose: bool = False, repeats: int = 2,
) -> dict:
    """Time each named query's oracle SQL on DuckDB over the sf_dir
    parquet. Returns {"total", "queries", "skipped", "errors"} —
    callable in-process (bench.py embeds a same-session anchor in its
    artifact so every BENCH_r*.json self-normalizes against host
    weather) or from this file's CLI. ``repeats``: min-of-N per query
    (default 2, matching bench.py's Spark side from round 13 — a
    single pass of the doc_stats twin alone swung the anchor total
    ±30% with host weather)."""
    import duckdb

    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written table (tools/gen_sf.py scale dirs): a
            # directory of part files — glob it. The driver's testdata
            # stays single-file and takes the plain-path branch, so
            # bench.py's embedded anchor is unchanged.
            con.execute(
                f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{path}/*.parquet')"
            )
        elif os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    from diagnosisextraction_ml_spark.plans.queries import oracle_sql

    oracles = oracle_sql()
    timings: dict[str, float] = {}
    skipped: list[str] = []
    errors: dict[str, str] = {}
    for _pass in range(max(1, repeats)):
        for name in names:
            sql = oracles.get(name)
            if sql is None:
                if _pass == 0:
                    skipped.append(name)
                continue
            if name in errors:
                continue
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception as exc:  # noqa: BLE001 — harness boundary
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                continue
            wall = round(time.time() - t0, 3)
            if name not in timings or wall < timings[name]:
                timings[name] = wall
            if verbose:
                print(json.dumps({"query": name, "pass": _pass, "sec": wall}), flush=True)
    return {
        "total": round(sum(timings.values()), 3),
        "queries": timings,
        "skipped": skipped,
        "errors": errors,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else None

    from bench import HEADLINE

    res = run_anchor(sf_dir, list(HEADLINE), threads=threads, verbose=True)
    timings, skipped, errors = res["queries"], res["skipped"], res["errors"]

    out = {
        "metric": "duckdb_anchor_total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf_dir": sf_dir,
    }
    if skipped:
        out["skipped_no_oracle"] = skipped
    if errors:
        out["errors"] = errors
        out["partial"] = True
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
