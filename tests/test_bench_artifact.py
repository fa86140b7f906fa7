"""bench.py artifact contract (VERDICT r14 'What's wrong' #1): the
stdout line stays compact/parseable and the per-query detail lands in
a round-stamped side file."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_detail_path_is_next_round(monkeypatch, tmp_path):
    # the driver writes BENCH_r{N}.json AFTER running bench, so at run
    # time the newest existing round is N-1 and the detail file is N
    (tmp_path / "BENCH_r07.json").write_text("{}")
    (tmp_path / "BENCH_r14.json").write_text("{}")
    monkeypatch.setattr(bench, "_REPO_ROOT", str(tmp_path))
    assert os.path.basename(bench._detail_path()) == "BENCH_DETAIL_r15.json"


def test_detail_path_fresh_tree(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "_REPO_ROOT", str(tmp_path))
    assert os.path.basename(bench._detail_path()) == "BENCH_DETAIL_r1.json"


def test_certified_floors_are_headline_names():
    # a typo'd certification would silently stop suppressing its row
    assert set(bench.CERTIFIED_FLOORS) <= set(bench.HEADLINE)


def test_compact_line_budget():
    # the stdout line must stay under the driver's ~2000-char capture
    # window even with every certified row flagged AND the full
    # per-query ``queries`` map (the driver-contract key restored in
    # r15 — values rounded to 2 decimals); build the worst-case
    # summary the way main() does and run it through the same
    # shrinking helper main() uses
    timings = {n: 99.985 for n in bench.HEADLINE}
    out = {
        "metric": "total_wall_sec", "value": 99.999, "unit": "sec",
        "queries": {n: round(t, 2) for n, t in timings.items()},
        "sf": 0.1,
        "anchor": {
            "duckdb_total_sec": 99.999, "spark_common_total_sec": 99.999,
            "ratio_spark_over_duckdb": 9.999,
            "n_common": len(bench.HEADLINE),
            "flagged_over_2x": sorted(bench.CERTIFIED_FLOORS),
            "certified_over_2x": len(bench.CERTIFIED_FLOORS),
        },
        "detail_file": "BENCH_DETAIL_r99.json",
    }
    line = bench._compact_line(out, timings)
    assert len(line) < 1950
    parsed = json.loads(line)
    # contract keys survive any shrinking
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in parsed
    assert set(parsed["queries"]) == set(bench.HEADLINE)
