"""The golden-harness re-run policy (NOTES.md), enforced mechanically:
GOLDEN_rN gates the 8-model 5x2cv metrics and is only allowed to
"stand" across rounds while plans/models.py, plans/features.py, and
plans/harness.py are byte-identical to what it was generated against.
tools/golden_report.py stamps those files' hashes into the report
header; this test fails the suite whenever the working tree drifts
from the newest committed artifact's header — i.e. someone changed a
gated file without re-running the ~10-minute golden gate."""

from __future__ import annotations

import glob
import os
import re

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_golden() -> str | None:
    arts = sorted(
        glob.glob(os.path.join(_REPO_ROOT, "GOLDEN_r*.txt")),
        key=lambda p: int(re.search(r"GOLDEN_r(\d+)", p).group(1)),
    )
    return arts[-1] if arts else None


def test_gated_sources_match_newest_golden_artifact():
    import sys

    if _REPO_ROOT not in sys.path:
        sys.path.insert(0, _REPO_ROOT)
    from tools.golden_report import gated_source_hashes

    art = _newest_golden()
    assert art is not None, "no GOLDEN_r*.txt artifact committed"
    header = [
        l for l in open(art, encoding="utf-8").read().splitlines()
        if l.startswith("# gated-source-hashes:")
    ]
    assert header, (
        f"{os.path.basename(art)} predates hash stamping — regenerate it "
        "with tools/golden_report.py (which now writes the header)"
    )
    recorded = dict(
        kv.split("=", 1) for kv in header[0].split(":", 1)[1].split()
    )
    current = gated_source_hashes()
    drifted = {k: (recorded.get(k), v) for k, v in current.items()
               if recorded.get(k) != v}
    assert not drifted, (
        "golden-gated source files changed since "
        f"{os.path.basename(art)} was generated: {drifted} — re-run "
        "`python tools/golden_report.py > GOLDEN_r<N>.txt` (NOTES.md policy)"
    )


def test_golden_artifact_passed():
    """The newest artifact must itself record a PASS — standing on a
    failing gate is not a policy the header hashes should bless."""
    art = _newest_golden()
    assert art is not None
    assert "RESULT: ALL WITHIN TOLERANCE" in open(art, encoding="utf-8").read()
